"""Frame-to-frame LiDAR odometry via hierarchical-GMM registration
(BASELINE.json config 4: "KITTI LiDAR scan-pair sequence").

Host loop over frames; all device work happens in shape-stable jitted
functions (fixed point bucket per run -> one compile, SURVEY.md §8 "pad N
to bucket sizes"). Warm starts: each pair is initialized with the previous
relative pose (constant-velocity model). Resumable at frame granularity
via hgmm.utils.checkpoint (SURVEY.md §6.4).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hgmm.models.gmm import Gmm
from hgmm.models.gmm_tree import GmmTree
from hgmm.models.se3 import Pose
from hgmm.pipelines.pose_graph import (
    EdgeList,
    PoseGraphResult,
    concat_edge_lists,
    odometry_chain_edges,
    refine_chain_sharded,
    refine_pose_graph,
)
from hgmm.pipelines.register import register_points, register_tree
from hgmm.utils import checkpoint as ckpt


@dataclasses.dataclass
class OdometryConfig:
    model_kind: str = "tree"  # "tree" | "flat"
    k: int = 64  # flat mixture size
    branch: int = 8
    levels: int = 3
    fit_iters: int = 10
    reg_iters: int = 30
    # Damped Mahalanobis WLS: exact anisotropic M-step — the Horn surrogate
    # is biased/divergent on plane-dominated LiDAR mixtures (see
    # configs.presets.CONFIG4_KITTI).
    method: str = "wls"
    top_k: int | None = None
    # Uniform-outlier LOG-DENSITY. Must sit well BELOW typical in-model
    # Gaussian log-densities or the outlier absorbs all responsibility mass
    # and the pose stops updating (for a p_out mass spread over scene volume
    # V: log(p_out / V) — metric-scale LiDAR scenes need ~ -8, unit-scale
    # scans ~ -3). None disables outlier gating.
    outlier_logit: float | None = -8.0
    complexity_threshold: float = 0.0
    voxel: float | None = None  # host-side voxel downsample (meters)
    bucket: int = 16384  # fixed per-frame point budget (pad/subsample)
    warm_start: bool = True
    seed: int = 0


@dataclasses.dataclass
class OdometryResult:
    abs_poses: list[Pose]  # [F] absolute poses (frame 0 = identity)
    rel_poses: list[Pose]  # [F-1] frame k -> k+1
    logliks: list[float]  # final registration loglik per pair
    # Loop closures detected by registering candidate non-adjacent pairs
    # (run_odometry(detect_closures=True)); refine_odometry consumes them
    # by default (SURVEY.md §3.6 "pose-graph refinement over registered
    # scan pairs").
    closures: EdgeList | None = None


def _bucketize(points: np.ndarray, bucket: int, rng: np.random.Generator):
    """Pad or subsample to exactly `bucket` points; returns (pts, weights)."""
    n = points.shape[0]
    if n >= bucket:
        idx = rng.choice(n, size=bucket, replace=False)
        return points[idx].astype(np.float32), np.ones(bucket, np.float32)
    pad = np.zeros((bucket - n, 3), np.float32)
    w = np.concatenate([np.ones(n, np.float32), np.zeros(bucket - n, np.float32)])
    return np.concatenate([points.astype(np.float32), pad]), w


def _fit_model(points, weights, cfg: OdometryConfig, key):
    """Returns a GmmTree (tree kind — registered coarse-to-fine) or flat
    MixtureParams."""
    if cfg.model_kind == "flat":
        gmm, _ = Gmm.fit(
            points, k=cfg.k, n_iters=cfg.fit_iters, key=key,
            point_weights=weights,
        )
        return gmm.params
    tree, _ = GmmTree.fit(
        points,
        branch=cfg.branch,
        levels=cfg.levels,
        em_iters=cfg.fit_iters,
        key=key,
        point_weights=weights,
    )
    return tree


def _fit_frame_model(tgt, cfg: OdometryConfig, key, mesh):
    """Fit the per-frame target model (flat MixtureParams or GmmTree),
    optionally through the sharded programs. Loop-closure verification
    caches these per frame index — the fit dominates per-candidate cost."""
    tgt_pts, tgt_w = tgt
    if mesh is None:
        return _fit_model(jnp.asarray(tgt_pts), jnp.asarray(tgt_w), cfg, key)
    from hgmm.models.gmm import init_params
    from hgmm.parallel import sharded_em_fit, sharded_tree_fit

    if cfg.model_kind == "flat":
        pts = jnp.asarray(tgt_pts)
        w = jnp.asarray(tgt_w)
        params, _ = sharded_em_fit(
            pts, init_params(pts, cfg.k, key, point_weights=w),
            mesh, n_iters=cfg.fit_iters, point_weights=w,
        )
        return params
    return sharded_tree_fit(
        jnp.asarray(tgt_pts), mesh, branch=cfg.branch,
        levels=cfg.levels, em_iters=cfg.fit_iters, key=key,
        point_weights=jnp.asarray(tgt_w),
    )


def _register_to_model(model, src, cfg: OdometryConfig, init: Pose, mesh):
    """Register source frame points onto a fitted model."""
    src_pts, src_w = src
    reg_kw = dict(
        init_pose=init, n_iters=cfg.reg_iters, method=cfg.method,
        top_k=cfg.top_k, outlier_logit=cfg.outlier_logit,
        point_weights=jnp.asarray(src_w),
    )
    if mesh is not None:
        from hgmm.parallel import sharded_register_points, sharded_register_tree

        if isinstance(model, GmmTree):
            return sharded_register_tree(
                jnp.asarray(src_pts), model, mesh,
                complexity_threshold=cfg.complexity_threshold, **reg_kw,
            )
        return sharded_register_points(jnp.asarray(src_pts), model, mesh, **reg_kw)
    if isinstance(model, GmmTree):
        # Coarse-to-fine down the tree: the leaf basin alone is smaller
        # than typical frame motion (see register_tree).
        return register_tree(
            jnp.asarray(src_pts), model,
            complexity_threshold=cfg.complexity_threshold, **reg_kw,
        )
    return register_points(jnp.asarray(src_pts), model, **reg_kw)


def _register_frames(tgt, src, cfg: OdometryConfig, key, init: Pose, mesh):
    """Fit a model to target frame points and register source frame onto it
    (one odometry pair; loop-closure verification uses the split helpers
    with a model cache)."""
    return _register_to_model(
        _fit_frame_model(tgt, cfg, key, mesh), src, cfg, init, mesh
    )


def run_odometry(
    scans: Sequence[np.ndarray] | Iterable[np.ndarray],
    config: OdometryConfig | None = None,
    checkpoint_path: str | Path | None = None,
    checkpoint_every: int = 10,
    mesh=None,
    metrics=None,
    detect_closures: bool = False,
    closure_config=None,
) -> OdometryResult:
    """Sequential scan-to-scan registration. `scans` yields [N_i, 3] arrays
    (use hgmm.data.kitti loaders for real sequences).

    mesh: optional jax.sharding.Mesh — per-frame fits and registrations run
    points-sharded over it (config 5 of BASELINE.json: multi-host frames).
    metrics: optional hgmm.utils.profiling.MetricsLog — per-pair structured
    JSONL records (SURVEY.md §6.5).
    detect_closures: after the scan-to-scan loop, propose loop-closure
    candidates by pose proximity and verify them by registration
    (pipelines.loop_closure); accepted edges land in result.closures and
    feed refine_odometry by default.
    """
    cfg = config or OdometryConfig()
    from hgmm.data.kitti import voxel_downsample

    rng = np.random.default_rng(cfg.seed)
    frames = []
    for s in scans:
        s = np.asarray(s)
        if cfg.voxel:
            s = voxel_downsample(s, cfg.voxel)
        frames.append(_bucketize(s, cfg.bucket, rng))
    f = len(frames)
    assert f >= 2, "need at least two scans"

    start = 0
    rel_poses: list[Pose] = []
    abs_poses: list[Pose] = [Pose.identity()]
    logliks: list[float] = []
    if checkpoint_path is not None:
        state = ckpt.load_odometry(checkpoint_path)
        if state is not None:
            start, rel_poses, abs_poses, logliks = state

    base_key = jax.random.PRNGKey(cfg.seed)
    prev_rel = Pose.identity()
    if rel_poses:
        prev_rel = rel_poses[-1]
    for i in range(start, f - 1):
        # fold_in (not sequential split): resumed runs must see the same
        # per-pair key regardless of the start frame.
        kf = jax.random.fold_in(base_key, i)
        init = prev_rel if cfg.warm_start else Pose.identity()
        res = _register_frames(frames[i], frames[i + 1], cfg, kf, init, mesh)
        # res.pose maps source (frame i+1) points into frame i: that IS the
        # pose of frame i+1 expressed in frame i.
        rel = res.pose
        rel_poses.append(rel)
        abs_poses.append(abs_poses[-1].compose(rel))
        logliks.append(float(res.logliks[-1]))
        if metrics is not None:
            metrics.log_registration(f"pair_{i}_{i + 1}", res)
        prev_rel = rel
        if checkpoint_path is not None and (i + 1) % checkpoint_every == 0:
            ckpt.save_odometry(checkpoint_path, i + 1, rel_poses, abs_poses,
                               logliks)

    if checkpoint_path is not None:
        ckpt.save_odometry(checkpoint_path, f - 1, rel_poses, abs_poses,
                           logliks)
    result = OdometryResult(
        abs_poses=abs_poses, rel_poses=rel_poses, logliks=logliks
    )
    if detect_closures:
        from hgmm.pipelines.loop_closure import detect_loop_closures

        result.closures = detect_loop_closures(
            frames, result, cfg, config=closure_config, mesh=mesh,
            metrics=metrics,
        )
    return result


def refine_odometry(
    result: OdometryResult,
    loop_closures=None,
    n_iters: int = 10,
    mesh=None,
    robust_delta: float | None = None,
) -> PoseGraphResult:
    """Pose-graph refinement of an odometry run (SURVEY.md §3.6).

    loop_closures: optional EdgeList to append to the chain; defaults to
    the closures detected by run_odometry(detect_closures=True).
    mesh: optional jax.sharding.Mesh — refinement runs through the
    distributed segment-wise Schur solver (pose_graph.refine_chain_sharded:
    keyframe/map blocks partitioned per device, BASELINE.json:5), which
    handles arbitrary chain lengths and loop closures and falls back to
    the dense solver for chains too short to shard.
    robust_delta: robust IRLS gate on edge residual norms — protects the
    graph against a false-positive detected closure (pose_graph.
    _robust_weight).
    """
    if loop_closures is None:
        loop_closures = result.closures
    R = jnp.stack([p.R for p in result.abs_poses])
    t = jnp.stack([p.t for p in result.abs_poses])
    if mesh is not None:
        return refine_chain_sharded(
            R, t,
            jnp.stack([p.R for p in result.rel_poses]),
            jnp.stack([p.t for p in result.rel_poses]),
            mesh, n_iters=n_iters, closures=loop_closures,
            robust_delta=robust_delta,
        )
    if R.shape[0] > 512:
        # Same guard as refine_chain_sharded's fallback (round-4 advisor
        # item 2): the dense solver builds an [M, M, 6, 6] Hessian per GN
        # step — a 2000-frame KITTI chain is ~2.3 GB of Hessian. The
        # sharded solver handles any chain length and closure count.
        import warnings

        warnings.warn(
            f"refine_odometry: dense pose-graph solve on {R.shape[0]} "
            f"nodes builds an [M, M, 6, 6] Hessian — pass mesh= to use "
            f"the distributed Schur solver at this scale",
            stacklevel=2,
        )
    edges = odometry_chain_edges(result.rel_poses)
    if loop_closures is not None:
        edges = concat_edge_lists(edges, loop_closures)
    return refine_pose_graph(R, t, edges, n_iters=n_iters,
                             robust_delta=robust_delta)
