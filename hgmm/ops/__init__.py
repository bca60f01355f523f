"""hgmm.ops — compute kernels (Pallas TPU + pure-JAX reference twins).

Dispatch policy: on TPU backends the fused Pallas kernels run; everywhere
else (CPU tests, fake-device meshes) the dense jnp twins in em_ref run.
Override with set_backend("ref" | "pallas" | "auto") — the equivalence test
suite runs both and compares (SURVEY.md §5.2).
"""

from __future__ import annotations

import jax

from hgmm.ops import em_ref
from hgmm.ops.em_ref import EmStats, RegStats  # noqa: F401
from hgmm.ops.gaussians import (  # noqa: F401
    PHI_DIM,
    PHI_PAD,
    MixtureParams,
    features,
    mstep_update,
    pack_loglik_weights,
    precision_terms,
    sym_pack,
    sym_unpack,
    unpack_suffstats,
)

_BACKEND = "auto"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "ref", "pallas"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def _pallas_active() -> bool:
    if _BACKEND == "ref":
        return False
    if _BACKEND == "pallas":
        return True
    return jax.default_backend() == "tpu"


def em_stats(points, W, point_weights=None, outlier_logit=None, shift=None) -> EmStats:
    """E-step + sufficient-stat reduction. See em_ref.em_stats.

    shift: optional exact global logit bound (gaussians.max_logit_params) —
    REQUIRED for numerical robustness whenever the mixture may carry
    collapsed covariances (iterated fits); ignored by the dense twin."""
    if _pallas_active():
        from hgmm.ops import fused_em

        return fused_em.em_stats(points, W, point_weights, outlier_logit,
                                 shift=shift)
    return em_ref.em_stats(points, W, point_weights, outlier_logit)


def em_stats_masked(
    points, W, parent, branch, point_weights=None, shift=None
) -> EmStats:
    """Tree-fit E-step masked to each point's parent's child block."""
    if _pallas_active():
        from hgmm.ops import fused_em

        return fused_em.em_stats_masked(
            points, W, parent, branch, point_weights, shift=shift
        )
    return em_ref.em_stats_masked(points, W, parent, branch, point_weights)


def assign(points, W, parent=None, branch=None):
    """Per-point hard (argmax) component assignment."""
    if _pallas_active():
        from hgmm.ops import fused_em

        return fused_em.assign(points, W, parent, branch)
    return em_ref.assign(points, W, parent, branch)


def reg_stats(
    x, W, mu, A6, b3, pose, point_weights=None, top_k=None, outlier_logit=None,
    shift=None,
) -> RegStats:
    """Registration E-step statistics (Horn moments + GN normal equations).

    pose: (R, t) applied to x in the op (in-kernel on TPU)."""
    if _pallas_active():
        from hgmm.ops import fused_em

        return fused_em.reg_stats(
            x, W, mu, A6, b3, pose=pose, point_weights=point_weights,
            top_k=top_k, outlier_logit=outlier_logit, shift=shift,
        )
    return em_ref.reg_stats(
        x, W, mu, A6, b3, pose, point_weights, top_k, outlier_logit
    )
