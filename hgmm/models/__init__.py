from hgmm.models.se3 import Pose, se3_exp, se3_log  # noqa: F401
from hgmm.models.gmm import Gmm, GmmParams, fit_gmm  # noqa: F401
from hgmm.models.gmm_tree import GmmTree, fit_gmm_tree  # noqa: F401
from hgmm.models import pose  # noqa: F401
