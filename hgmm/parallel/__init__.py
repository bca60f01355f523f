from hgmm.parallel.mesh import (  # noqa: F401
    POINTS_AXIS,
    initialize_multihost,
    make_mesh,
    points_sharding,
    replicated,
    shard_points_from_host,
)
from hgmm.parallel.sharded import (  # noqa: F401
    pad_points_for_mesh,
    sharded_em_fit,
    sharded_register_points,
    sharded_tree_fit,
)
