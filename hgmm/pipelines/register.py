"""Pairwise rigid registration: jitted scan over (E-step assoc, pose M-step).

Replaces the reference's per-iteration kernel-launch + memcpy + host-solve
loop (SURVEY.md §4.1a) with ONE compiled program: the whole iterate loop is
a lax.scan, the only host<->device crossing is at call boundaries
(BASELINE.json:5 "the registration loop becomes a jitted scan over EM+pose
iterations").

Methods (BASELINE.json:5 "weighted Horn/Mahalanobis alignment"):
- "horn": weighted Horn/Umeyama on virtual targets — robust, large basin.
- "wls": Mahalanobis Gauss-Newton on the se(3) twist — anisotropic-exact.
- "horn+wls": Horn for the first half of iterations, then WLS refinement.
"""

from __future__ import annotations

import typing
from functools import partial

import jax
import jax.numpy as jnp

from hgmm import ops
from hgmm.models.gmm import Gmm
from hgmm.models.gmm_tree import GmmTree
from hgmm.models.pose import (
    apply_wls_increment,
    solve_horn,
    solve_wls_increment,
)
from hgmm.models.se3 import Pose, se3_log
from hgmm.ops.gaussians import (
    MixtureParams,
    pack_loglik_weights,
    precision_terms,
    sym_pack,
)


class RegistrationResult(typing.NamedTuple):
    pose: Pose
    logliks: jax.Array  # [n_iters] data log-likelihood per iteration
    deltas: jax.Array  # [n_iters] ||se3 increment|| per iteration
    converged: jax.Array  # [] bool


def model_terms(params: MixtureParams):
    """Precompute the per-component terms every registration iteration
    reuses: W [10,K] packed logits, mu [K,3], A6 [K,6] packed precisions,
    b3 [K,3] = Sigma^-1 mu."""
    A, b, _ = precision_terms(params)
    return pack_loglik_weights(params), params.mu, sym_pack(A), b


@partial(
    jax.jit,
    static_argnames=("n_iters", "method", "top_k", "wls_inner"),
)
def register_points(
    source: jax.Array,
    params: MixtureParams,
    init_pose: Pose | None = None,
    n_iters: int = 50,
    method: str = "horn+wls",
    tol: float = 1e-7,
    top_k: int | None = None,
    outlier_logit: float | None = None,
    point_weights: jax.Array | None = None,
    wls_inner: int = 2,
) -> RegistrationResult:
    """Register `source` [N,3] onto a fitted mixture. Returns the pose T with
    T(source) ~ target."""
    if init_pose is None:
        init_pose = Pose.identity(source.dtype)
    W, mu, A6, b3 = model_terms(params)
    n_horn = n_iters // 2 if method == "horn+wls" else (n_iters if method == "horn" else 0)

    def step(carry, it):
        R, t, done = carry
        pose = Pose(R, t)
        stats = ops.reg_stats(
            source, W, mu, A6, b3, (R, t), point_weights, top_k, outlier_logit
        )
        horn_pose = solve_horn(stats.horn)

        def wls_pose():
            p = pose
            # A few Gauss-Newton inner steps, refreshing associations each
            # time (associations are cheap: same fused kernel).
            xi = solve_wls_increment(stats.A, stats.b)
            p = apply_wls_increment(p, xi)
            for _ in range(wls_inner - 1):
                s2 = ops.reg_stats(
                    source, W, mu, A6, b3, (p.R, p.t), point_weights, top_k,
                    outlier_logit,
                )
                p = apply_wls_increment(p, solve_wls_increment(s2.A, s2.b))
            return p

        if method == "horn":
            new_pose = horn_pose
        elif method == "wls":
            new_pose = wls_pose()
        else:  # horn+wls schedule
            use_horn = it < n_horn
            wp = wls_pose()
            new_pose = Pose(
                jnp.where(use_horn, horn_pose.R, wp.R),
                jnp.where(use_horn, horn_pose.t, wp.t),
            )

        delta = jnp.linalg.norm(se3_log(new_pose.compose(pose.inverse())))
        new_done = done | (delta < tol)
        R_out = jnp.where(done, R, new_pose.R)
        t_out = jnp.where(done, t, new_pose.t)
        return (R_out, t_out, new_done), (stats.loglik, jnp.where(done, 0.0, delta))

    carry0 = (init_pose.R, init_pose.t, jnp.zeros((), dtype=bool))
    (R, t, done), (logliks, deltas) = jax.lax.scan(
        step, carry0, jnp.arange(n_iters)
    )
    return RegistrationResult(
        pose=Pose(R, t), logliks=logliks, deltas=deltas, converged=done
    )


def register_pair(
    source: jax.Array,
    target: jax.Array | None = None,
    model: Gmm | GmmTree | MixtureParams | None = None,
    model_kind: str = "tree",
    k: int = 64,
    branch: int = 8,
    levels: int = 3,
    fit_iters: int = 20,
    complexity_threshold: float = 0.0,
    key: jax.Array | None = None,
    **register_kw,
) -> RegistrationResult:
    """End-to-end pairwise registration (SURVEY.md §4.2 entry point).

    Either pass `target` (a mixture is fitted to it) or a prefit `model`.
    model_kind: "flat" (config 1) or "tree" (config 2).
    """
    if model is None:
        assert target is not None, "need target cloud or prefit model"
        if model_kind == "flat":
            model, _ = Gmm.fit(target, k=k, n_iters=fit_iters, key=key)
        else:
            model, _ = GmmTree.fit(
                target, branch=branch, levels=levels, em_iters=fit_iters, key=key
            )
    if isinstance(model, Gmm):
        params = model.params
    elif isinstance(model, GmmTree):
        params = model.cut_mixture(complexity_threshold)
    else:
        params = model
    return register_points(source, params, **register_kw)
