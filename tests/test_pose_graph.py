import jax
import jax.numpy as jnp
import numpy as np

from hgmm.models.se3 import Pose, random_pose, se3_exp, so3_exp
from hgmm.parallel import make_mesh
from hgmm.pipelines.pose_graph import (
    EdgeList,
    PoseGraphResult,
    odometry_chain_edges,
    refine_chain_sharded,
    refine_pose_graph,
)


def _circle_traj(m, radius=5.0):
    """Ground-truth poses around a circle (heading tangent)."""
    poses = []
    for k in range(m):
        th = 2 * np.pi * k / m
        R = so3_exp(jnp.array([0.0, 0.0, th]))
        t = jnp.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        poses.append(Pose(R, t))
    return poses


def _rel(a: Pose, b: Pose) -> Pose:
    return a.inverse().compose(b)


def _stack(poses):
    return jnp.stack([p.R for p in poses]), jnp.stack([p.t for p in poses])


def test_chain_refinement_recovers_consistency():
    """Perturbed initial poses + exact odometry edges -> GN drives
    residuals to ~0 and matches the integrated chain."""
    m = 9
    gt = _circle_traj(m)
    edges = odometry_chain_edges([_rel(gt[k], gt[k + 1]) for k in range(m - 1)])
    # perturb every pose except the gauge-fixed first
    keys = jax.random.split(jax.random.PRNGKey(0), m)
    init = [gt[0]] + [
        gt[k].compose(random_pose(keys[k], 0.05, 0.05)) for k in range(1, m)
    ]
    R0, t0 = _stack(init)
    out = refine_pose_graph(R0, t0, edges, n_iters=10)
    assert float(out.residual_history[-1]) < 1e-6 * float(out.residual_history[0] + 1e-12)
    gtR, gtt = _stack(gt)
    np.testing.assert_allclose(out.t, gtt, atol=1e-3)


def test_loop_closure_reduces_drift():
    """Noisy odometry + loop closure: refined trajectory beats dead
    reckoning (synthetic circular trajectory, SURVEY.md §5.2 golden)."""
    m = 12
    gt = _circle_traj(m)
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, m)
    noisy_rel = [
        _rel(gt[k], gt[k + 1]).compose(random_pose(keys[k], 0.03, 0.03))
        for k in range(m - 1)
    ]
    # dead-reckoned init
    init = [gt[0]]
    for z in noisy_rel:
        init.append(init[-1].compose(z))
    # edges: chain + exact loop closure (last -> first is known on a circle)
    chain = odometry_chain_edges(noisy_rel)
    lc = _rel(gt[m - 1], gt[0])
    edges = EdgeList(
        i=jnp.concatenate([chain.i, jnp.array([m - 1], jnp.int32)]),
        j=jnp.concatenate([chain.j, jnp.array([0], jnp.int32)]),
        R=jnp.concatenate([chain.R, lc.R[None]]),
        t=jnp.concatenate([chain.t, lc.t[None]]),
        weight=jnp.concatenate([chain.weight, jnp.array([10.0])]),
    )
    R0, t0 = _stack(init)
    out = refine_pose_graph(R0, t0, edges, n_iters=15)
    gtR, gtt = _stack(gt)
    drift_before = float(jnp.linalg.norm(t0 - gtt))
    drift_after = float(jnp.linalg.norm(out.t - gtt))
    assert drift_after < 0.7 * drift_before, (drift_before, drift_after)


def test_sharded_schur_matches_dense():
    """Segment-wise Schur over an 8-device mesh == dense GN on the same
    chain (the distributed path is algebraically exact)."""
    mesh = make_mesh()
    s = mesh.devices.size
    l_seg = 3
    m = s * l_seg + 1
    gt = _circle_traj(m)
    keys = jax.random.split(jax.random.PRNGKey(2), m)
    rel = [_rel(gt[k], gt[k + 1]) for k in range(m - 1)]
    init = [gt[0]] + [
        gt[k].compose(random_pose(keys[k], 0.04, 0.04)) for k in range(1, m)
    ]
    R0, t0 = _stack(init)
    edges = odometry_chain_edges(rel)
    dense = refine_pose_graph(R0, t0, edges, n_iters=8, damping=1e-8)
    shard = refine_chain_sharded(
        R0, t0, edges.R, edges.t, mesh, n_iters=8, damping=1e-8
    )
    np.testing.assert_allclose(shard.t, dense.t, atol=1e-3)
    np.testing.assert_allclose(shard.R, dense.R, atol=1e-3)
    assert float(shard.residual_history[-1]) < 1e-5
