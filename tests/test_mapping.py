"""Global map building + map-based localization (pipelines.mapping):
frames fused by their poses into one GMM-tree map, new scans localized
against it by coarse-to-fine registration — the SLAM-frontend capstone
over the pairwise engine."""

import jax
import jax.numpy as jnp
import numpy as np

from hgmm.data.synthetic import make_cloud
from hgmm.models.se3 import Pose, so3_exp
from hgmm.parallel import make_mesh
from hgmm.pipelines.mapping import MapConfig, build_map, fuse_frames, localize
from test_loop_closure import _loop_sequence


def _held_out_view(scene, pose, fov=1.6, noise=0.004, seed=99):
    pts = np.asarray(pose.inverse().apply(scene))
    bearing = np.arctan2(pts[:, 1], pts[:, 0])
    pts = pts[np.abs(bearing) < fov]
    return (
        pts
        + noise
        * np.asarray(jax.random.normal(jax.random.PRNGKey(seed), pts.shape))
    ).astype(np.float32)


def test_fuse_frames_drops_padding_and_transforms():
    pts = np.array([[1.0, 0, 0], [0, 1.0, 0], [9.9, 9.9, 9.9]], np.float32)
    w = np.array([1.0, 1.0, 0.0], np.float32)  # third row is bucket padding
    pose = Pose(so3_exp(jnp.array([0.0, 0.0, np.pi / 2])), jnp.array([1.0, 0, 0]))
    fused = fuse_frames([(pts, w)], [pose], voxel=0)
    assert fused.shape == (2, 3)
    np.testing.assert_allclose(
        fused, [[1.0, 1.0, 0.0], [0.0, 0.0, 0.0]], atol=1e-5
    )


def test_build_map_and_localize():
    """Map fit from posed frames; a NEW view (not in the sequence, its own
    noise draw) localizes against the map to its ground-truth pose."""
    frames, gt = _loop_sequence(n_frames=12)
    scene = make_cloud(jax.random.PRNGKey(0), 4000, kind="trefoil")
    tree = build_map(
        frames, gt, MapConfig(levels=2, em_iters=8, bucket=4096, voxel=0)
    )
    assert tree.n_leaves == 64

    # Held-out pose between frames 0 and 1 (small motion -> identity init).
    th = np.pi / 12.0
    radius = 0.09 * 12 / (2 * np.pi)
    hp = Pose(
        so3_exp(jnp.array([0.0, 0.0, 0.3 * np.sin(th)])),
        jnp.array([radius * np.cos(th) - radius, radius * np.sin(th), 0.0]),
    )
    scan = _held_out_view(scene, hp)
    res = localize(scan, tree, n_iters=25, outlier_logit=-3.0)
    err_t = float(jnp.linalg.norm(res.pose.t - hp.t))
    # Geodesic rotation error.
    tr = float(jnp.trace(res.pose.R.T @ hp.R))
    err_r = float(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    assert err_t < 0.02, (err_t, np.asarray(res.pose.t), np.asarray(hp.t))
    assert err_r < 0.05, err_r


def test_build_map_and_localize_through_mesh():
    """Sharded twin: map fit through sharded_tree_fit (config-5 program)
    and localization through sharded_register_tree agree with the
    single-device path's recovered pose."""
    frames, gt = _loop_sequence(n_frames=12)
    scene = make_cloud(jax.random.PRNGKey(0), 4000, kind="trefoil")
    mesh = make_mesh()
    cfg = MapConfig(levels=2, em_iters=8, bucket=4096, voxel=0)
    tree_sh = build_map(frames, gt, cfg, mesh=mesh)
    tree = build_map(frames, gt, cfg)
    # Same fit through the sharded program (psum of partials, fp-level).
    np.testing.assert_allclose(
        np.asarray(tree_sh.levels[-1].mu), np.asarray(tree.levels[-1].mu),
        atol=1e-3,
    )
    th = np.pi / 12.0
    radius = 0.09 * 12 / (2 * np.pi)
    hp = Pose(
        so3_exp(jnp.array([0.0, 0.0, 0.3 * np.sin(th)])),
        jnp.array([radius * np.cos(th) - radius, radius * np.sin(th), 0.0]),
    )
    scan = _held_out_view(scene, hp)
    res = localize(scan, tree_sh, mesh=mesh, n_iters=25, outlier_logit=-3.0)
    err_t = float(jnp.linalg.norm(res.pose.t - hp.t))
    assert err_t < 0.02, err_t


def test_map_from_refined_odometry():
    """End-to-end: odometry poses (no ground truth) -> map -> the map's
    leaf mixture assigns finite, in-model log-likelihood to a fresh scene
    sample (the map really covers the scene)."""
    from hgmm.ops import em_ref
    from hgmm.ops.gaussians import pack_loglik_weights
    from hgmm.pipelines.odometry import OdometryConfig, run_odometry

    frames, gt = _loop_sequence(n_frames=10)
    cfg = OdometryConfig(
        model_kind="flat", k=24, fit_iters=8, reg_iters=8, bucket=1024,
        outlier_logit=-3.0,
    )
    res = run_odometry(frames, cfg)
    tree = build_map(
        frames, res.abs_poses, MapConfig(levels=2, em_iters=6, bucket=4096)
    )
    probe = make_cloud(jax.random.PRNGKey(5), 512, kind="trefoil")
    st = em_ref.em_stats(probe, pack_loglik_weights(tree.leaf_mixture()))
    ll_pp = float(st.loglik) / probe.shape[0]
    assert np.isfinite(ll_pp) and ll_pp > -10.0, ll_pp


def test_update_map_retains_old_region():
    """Multi-session mapping: a map of scene A, updated with frames that
    see ONLY a disjoint scene B (session-A frames discarded), must still
    explain scene A — while a from-scratch fit of the B frames does not
    (the synthesized carry is what retains the old evidence). Disjoint
    scenes are required: a loop sequence's halves view the same geometry,
    so any split of it cannot distinguish carry from coverage."""
    from hgmm.ops import em_ref
    from hgmm.ops.gaussians import pack_loglik_weights
    from hgmm.pipelines.mapping import update_map

    scene_a = np.asarray(make_cloud(jax.random.PRNGKey(0), 3000, kind="trefoil"))
    scene_b = np.asarray(
        make_cloud(jax.random.PRNGKey(1), 3000, kind="helix")
    ) + np.array([5.0, 0.0, 0.0], np.float32)
    rng = np.random.default_rng(2)

    def session(scene, n_frames, yaw0):
        frames, poses = [], []
        for k in range(n_frames):
            p = Pose(
                so3_exp(jnp.array([0.0, 0.0, yaw0 + 0.1 * k])),
                jnp.asarray(scene.mean(axis=0) + [0.1 * k, 0.05 * k, 0.0]),
            )
            pts = np.asarray(p.inverse().apply(jnp.asarray(scene)))
            pts = pts + 0.004 * rng.standard_normal(pts.shape).astype(np.float32)
            frames.append(pts.astype(np.float32))
            poses.append(p)
        return frames, poses

    frames_a, poses_a = session(scene_a, 4, 0.0)
    frames_b, poses_b = session(scene_b, 4, 0.5)
    cfg = MapConfig(levels=2, em_iters=8, bucket=4096, voxel=0)
    map_a = build_map(frames_a, poses_a, cfg)
    map_ab = update_map(map_a, frames_b, poses_b, cfg)
    map_b_only = build_map(frames_b, poses_b, cfg)

    probe_a = jnp.asarray(scene_a[:512])
    probe_b = jnp.asarray(scene_b[:512])

    def ll(tree, probe):
        st = em_ref.em_stats(probe, pack_loglik_weights(tree.leaf_mixture()))
        return float(st.loglik) / probe.shape[0]

    ll_a_updated = ll(map_ab, probe_a)
    ll_a_fresh_b = ll(map_b_only, probe_a)
    ll_b_updated = ll(map_ab, probe_b)
    # Updated map covers BOTH scenes; the B-only map fails scene A badly.
    assert ll_a_updated > ll_a_fresh_b + 10.0, (ll_a_updated, ll_a_fresh_b)
    assert np.isfinite(ll_b_updated) and ll_b_updated > -10.0
    # And the update didn't wreck scene-B coverage vs its dedicated fit.
    assert ll_b_updated > ll(map_b_only, probe_b) - 2.0


def test_export_map_writes_ply(tmp_path):
    from hgmm.data.ply import load_ply
    from hgmm.viz.export import export_map

    frames, gt = _loop_sequence(n_frames=10)
    tree = build_map(
        frames, gt, MapConfig(levels=2, em_iters=6, bucket=2048, voxel=0)
    )
    out = tmp_path / "map.ply"
    export_map(out, tree, samples_per_leaf=8)
    pts = load_ply(out)
    n_live = int(np.sum(np.asarray(tree.leaf_mixture().pi) > 0))
    assert pts.shape == (n_live * 9, 3)  # means + 8 samples per live leaf
    assert np.all(np.isfinite(pts))
