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


def test_sharded_schur_arbitrary_length_matches_dense():
    """Round-4: chains whose length is NOT S*L+1 shard exactly (weight-0
    slot padding, no stiff-penalty approximation)."""
    mesh = make_mesh()
    s = mesh.devices.size
    for m in (s * 2 + 4, s * 3 - 1, s + 3):
        gt = _circle_traj(m)
        keys = jax.random.split(jax.random.PRNGKey(3 + m), m)
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


def test_sharded_schur_with_loop_closure_matches_dense():
    """Round-4: loop-closure edges ride the psum'd keyframe system — the
    sharded solve with a closure on an arbitrary-length noisy chain matches
    the dense solve and reduces drift."""
    mesh = make_mesh()
    s = mesh.devices.size
    m = s * 2 + 5  # non-divisible chain
    gt = _circle_traj(m)
    keys = jax.random.split(jax.random.PRNGKey(5), m)
    noisy_rel = [
        _rel(gt[k], gt[k + 1]).compose(random_pose(keys[k], 0.03, 0.03))
        for k in range(m - 1)
    ]
    init = [gt[0]]
    for z in noisy_rel:
        init.append(init[-1].compose(z))
    R0, t0 = _stack(init)
    chain = odometry_chain_edges(noisy_rel)
    lc = _rel(gt[m - 1], gt[0])
    closures = EdgeList(
        i=jnp.array([m - 1], jnp.int32),
        j=jnp.array([0], jnp.int32),
        R=lc.R[None], t=lc.t[None], weight=jnp.array([10.0]),
    )
    dense_edges = EdgeList(
        i=jnp.concatenate([chain.i, closures.i]),
        j=jnp.concatenate([chain.j, closures.j]),
        R=jnp.concatenate([chain.R, closures.R]),
        t=jnp.concatenate([chain.t, closures.t]),
        weight=jnp.concatenate([chain.weight, closures.weight]),
    )
    dense = refine_pose_graph(R0, t0, dense_edges, n_iters=10, damping=1e-8)
    shard = refine_chain_sharded(
        R0, t0, chain.R, chain.t, mesh, n_iters=10, damping=1e-8,
        closures=closures,
    )
    np.testing.assert_allclose(shard.t, dense.t, atol=1e-3)
    np.testing.assert_allclose(shard.R, dense.R, atol=1e-3)
    np.testing.assert_allclose(
        shard.residual_history, dense.residual_history, rtol=1e-3, atol=1e-5
    )
    gtR, gtt = _stack(gt)
    drift_before = float(jnp.linalg.norm(t0 - gtt))
    drift_after = float(jnp.linalg.norm(shard.t - gtt))
    # One closure constrains the loop sum, not interior sag — on this
    # longer chain expect a solid but not 'matched-dense-with-many-edges'
    # improvement (the exactness asserts above are the real test).
    assert drift_after < 0.85 * drift_before, (drift_before, drift_after)


def test_sharded_schur_interior_closure_promotes_keyframe():
    """A closure whose endpoints are interior chain nodes forces those
    nodes into the keyframe set; result still matches dense."""
    mesh = make_mesh()
    s = mesh.devices.size
    m = 3 * s + 2
    gt = _circle_traj(m)
    keys = jax.random.split(jax.random.PRNGKey(6), m)
    noisy_rel = [
        _rel(gt[k], gt[k + 1]).compose(random_pose(keys[k], 0.02, 0.02))
        for k in range(m - 1)
    ]
    init = [gt[0]]
    for z in noisy_rel:
        init.append(init[-1].compose(z))
    R0, t0 = _stack(init)
    chain = odometry_chain_edges(noisy_rel)
    ci, cj = 3, m - 4  # interior, not multiples of any segment length
    lc = _rel(gt[ci], gt[cj])
    closures = EdgeList(
        i=jnp.array([ci], jnp.int32), j=jnp.array([cj], jnp.int32),
        R=lc.R[None], t=lc.t[None], weight=jnp.array([5.0]),
    )
    dense = refine_pose_graph(
        R0, t0,
        EdgeList(
            i=jnp.concatenate([chain.i, closures.i]),
            j=jnp.concatenate([chain.j, closures.j]),
            R=jnp.concatenate([chain.R, closures.R]),
            t=jnp.concatenate([chain.t, closures.t]),
            weight=jnp.concatenate([chain.weight, closures.weight]),
        ),
        n_iters=8, damping=1e-8,
    )
    shard = refine_chain_sharded(
        R0, t0, chain.R, chain.t, mesh, n_iters=8, damping=1e-8,
        closures=closures,
    )
    np.testing.assert_allclose(shard.t, dense.t, atol=1e-3)
    np.testing.assert_allclose(shard.R, dense.R, atol=1e-3)


def test_sharded_schur_short_chain_falls_back_dense():
    """Chains too short to shard (M-1 < n_devices) transparently dispatch
    to the dense solver."""
    mesh = make_mesh()
    m = max(3, mesh.devices.size - 2)
    gt = _circle_traj(m)
    rel = [_rel(gt[k], gt[k + 1]) for k in range(m - 1)]
    keys = jax.random.split(jax.random.PRNGKey(7), m)
    init = [gt[0]] + [
        gt[k].compose(random_pose(keys[k], 0.03, 0.03)) for k in range(1, m)
    ]
    R0, t0 = _stack(init)
    edges = odometry_chain_edges(rel)
    dense = refine_pose_graph(R0, t0, edges, n_iters=6)
    shard = refine_chain_sharded(R0, t0, edges.R, edges.t, mesh, n_iters=6)
    np.testing.assert_allclose(shard.t, dense.t, atol=1e-5)


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


def test_robust_kernel_rejects_false_closure():
    """A grossly wrong closure edge with the redescending Geman-McClure
    kernel on is effectively switched off: the refined trajectory stays
    near the chain-only solution instead of being dragged to the false
    constraint; without it the same edge corrupts the graph. Dense and
    sharded paths agree."""
    mesh = make_mesh()
    s = mesh.devices.size
    m = 2 * s + 3
    gt = _circle_traj(m)
    keys = jax.random.split(jax.random.PRNGKey(9), m)
    noisy_rel = [
        _rel(gt[k], gt[k + 1]).compose(random_pose(keys[k], 0.01, 0.01))
        for k in range(m - 1)
    ]
    init = [gt[0]]
    for z in noisy_rel:
        init.append(init[-1].compose(z))
    R0, t0 = _stack(init)
    chain = odometry_chain_edges(noisy_rel)
    # False closure: claims node m-2 sits AT node 1 (wildly wrong).
    false_lc = EdgeList(
        i=jnp.array([1], jnp.int32), j=jnp.array([m - 2], jnp.int32),
        R=jnp.eye(3)[None], t=jnp.zeros((1, 3)), weight=jnp.array([10.0]),
    )
    all_edges = EdgeList(
        i=jnp.concatenate([chain.i, false_lc.i]),
        j=jnp.concatenate([chain.j, false_lc.j]),
        R=jnp.concatenate([chain.R, false_lc.R]),
        t=jnp.concatenate([chain.t, false_lc.t]),
        weight=jnp.concatenate([chain.weight, false_lc.weight]),
    )
    clean = refine_pose_graph(R0, t0, chain, n_iters=10)
    corrupt = refine_pose_graph(R0, t0, all_edges, n_iters=10)
    robust = refine_pose_graph(R0, t0, all_edges, n_iters=10, robust_delta=0.1)
    d_corrupt = float(jnp.linalg.norm(corrupt.t - clean.t))
    d_robust = float(jnp.linalg.norm(robust.t - clean.t))
    assert d_corrupt > 1.0, d_corrupt  # the false edge really is damaging
    assert d_robust < 0.05 * d_corrupt, (d_robust, d_corrupt)

    shard = refine_chain_sharded(
        R0, t0, chain.R, chain.t, mesh, n_iters=10, closures=false_lc,
        robust_delta=0.1,
    )
    np.testing.assert_allclose(shard.t, robust.t, atol=1e-3)


def test_sharded_schur_property_sweep():
    """Property sweep: random chain lengths x random closure placements
    must all match the dense oracle (exercises every padding/keyframe
    layout the static segmentation can produce)."""
    mesh = make_mesh()
    s = mesh.devices.size
    rng = np.random.default_rng(0)
    for trial in range(6):
        m = int(rng.integers(s + 1, 4 * s + 3))
        gt = _circle_traj(m)
        keys = jax.random.split(jax.random.PRNGKey(40 + trial), m)
        noisy_rel = [
            _rel(gt[k], gt[k + 1]).compose(random_pose(keys[k], 0.02, 0.02))
            for k in range(m - 1)
        ]
        init = [gt[0]]
        for z in noisy_rel:
            init.append(init[-1].compose(z))
        R0, t0 = _stack(init)
        chain = odometry_chain_edges(noisy_rel)
        n_cl = int(rng.integers(0, 3))
        nodes = rng.choice(m, size=2 * n_cl, replace=False) if n_cl else []
        cls = None
        dense_edges = chain
        if n_cl:
            ci = np.sort(nodes[:n_cl])
            cj = np.sort(nodes[n_cl:])
            pairs = [(int(a), int(b)) for a, b in zip(ci, cj) if a != b]
            if pairs:
                lcs = [_rel(gt[a], gt[b]) for a, b in pairs]
                cls = EdgeList(
                    i=jnp.asarray([p[0] for p in pairs], jnp.int32),
                    j=jnp.asarray([p[1] for p in pairs], jnp.int32),
                    R=jnp.stack([l.R for l in lcs]),
                    t=jnp.stack([l.t for l in lcs]),
                    weight=jnp.full((len(pairs),), 3.0),
                )
                dense_edges = EdgeList(
                    i=jnp.concatenate([chain.i, cls.i]),
                    j=jnp.concatenate([chain.j, cls.j]),
                    R=jnp.concatenate([chain.R, cls.R]),
                    t=jnp.concatenate([chain.t, cls.t]),
                    weight=jnp.concatenate([chain.weight, cls.weight]),
                )
        dense = refine_pose_graph(R0, t0, dense_edges, n_iters=6, damping=1e-8)
        shard = refine_chain_sharded(
            R0, t0, chain.R, chain.t, mesh, n_iters=6, damping=1e-8,
            closures=cls,
        )
        np.testing.assert_allclose(
            shard.t, dense.t, atol=2e-3,
            err_msg=f"trial {trial}: m={m} closures={cls and len(pairs)}",
        )


def test_sharded_schur_many_closures_matches_dense():
    """Round-5 (verdict item 1): C >> S closures — mixed same-segment and
    cross-segment endpoints — reduce EXACTLY through the retained-node
    Schur system; no S+1 keyframe budget, no dense fallback."""
    mesh = make_mesh()
    s = mesh.devices.size
    m = 10 * s + 3  # 83 nodes on 8 devices -> ~10-edge segments
    gt = _circle_traj(m)
    keys = jax.random.split(jax.random.PRNGKey(11), m)
    noisy_rel = [
        _rel(gt[k], gt[k + 1]).compose(random_pose(keys[k], 0.015, 0.015))
        for k in range(m - 1)
    ]
    init = [gt[0]]
    for z in noisy_rel:
        init.append(init[-1].compose(z))
    R0, t0 = _stack(init)
    chain = odometry_chain_edges(noisy_rel)
    # 20 closures (2.5x the device count): even pairs span segments, odd
    # pairs sit inside one segment (j - i < segment length ~10); endpoint
    # 0 and m-1 land on boundaries, most endpoints are interior.
    rng = np.random.default_rng(5)
    pairs = []
    for c in range(20):
        if c % 2 == 0:
            i = int(rng.integers(0, m - 25))
            j = int(rng.integers(i + 20, m))
        else:
            i = int(rng.integers(0, m - 8))
            j = i + int(rng.integers(2, 7))
        pairs.append((i, j))
    pairs = sorted(set(pairs))
    lcs = [_rel(gt[a], gt[b]) for a, b in pairs]
    cls = EdgeList(
        i=jnp.asarray([p[0] for p in pairs], jnp.int32),
        j=jnp.asarray([p[1] for p in pairs], jnp.int32),
        R=jnp.stack([l.R for l in lcs]),
        t=jnp.stack([l.t for l in lcs]),
        weight=jnp.full((len(pairs),), 4.0),
    )
    dense_edges = EdgeList(
        i=jnp.concatenate([chain.i, cls.i]),
        j=jnp.concatenate([chain.j, cls.j]),
        R=jnp.concatenate([chain.R, cls.R]),
        t=jnp.concatenate([chain.t, cls.t]),
        weight=jnp.concatenate([chain.weight, cls.weight]),
    )
    dense = refine_pose_graph(R0, t0, dense_edges, n_iters=8, damping=1e-8)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any dense-fallback warning fails
        shard = refine_chain_sharded(
            R0, t0, chain.R, chain.t, mesh, n_iters=8, damping=1e-8,
            closures=cls,
        )
    np.testing.assert_allclose(shard.t, dense.t, atol=2e-3)
    np.testing.assert_allclose(shard.R, dense.R, atol=2e-3)
    np.testing.assert_allclose(
        shard.residual_history, dense.residual_history, rtol=1e-3, atol=1e-5
    )


def test_segmentation_admits_kitti_scale_closure_counts():
    """The static segmentation never falls back to dense for m-1 >= S,
    regardless of closure count (a 2000-frame chain with 60 revisit
    endpoints was the round-4 failure mode), and its index arrays satisfy
    the retained-node invariants."""
    from hgmm.pipelines.pose_graph import _chain_segmentation

    rng = np.random.default_rng(7)
    m, s = 2000, 8
    closure_nodes = rng.choice(m, size=60, replace=False).tolist()
    seg = _chain_segmentation(m, s, closure_nodes)
    assert seg is not None, "dense fallback at KITTI scale"
    # Every closure endpoint has a reduced-system index.
    for x in closure_nodes:
        assert int(x) in seg["gid_of"]
    # perm rows are permutations of 0..L; retained slots are the prefix.
    l1 = seg["l_seg"] + 1
    for d in range(s):
        assert sorted(seg["perm"][d].tolist()) == list(range(l1))
    # gnode: real entries unique; ALL dummies share the single dump id m.
    real = [n for n in seg["gnode"].tolist() if n < m]
    assert len(real) == len(set(real))
    assert seg["gnode"].tolist().count(m) == 1
    # Reduced system is exactly boundaries ∪ closures + 1 dump row —
    # independent of closure clustering (round-5 review: per-dummy unique
    # indices previously inflated a clustered case to O(S*C) nodes).
    assert seg["g_tot"] == len(real) + 1
    assert seg["g_tot"] <= (s + 1) + 60 + 1

    # Worst-case clustering: 60 closure endpoints inside ONE segment must
    # not inflate the reduced system beyond |retained| + 1.
    clustered = (10 + np.arange(60) * 2).tolist()  # all within [10, 128]
    seg_c = _chain_segmentation(2000, 8, clustered)
    assert seg_c is not None
    assert seg_c["g_tot"] == len(set(clustered) | set(seg_c["bounds"].tolist())) + 1
    assert seg_c["g_tot"] <= 9 + 60 + 1

    # Tiny meshes (the round-4 advisor's 1-2 device case) also shard with
    # arbitrary closures now.
    seg1 = _chain_segmentation(40, 2, [3, 17, 22, 31, 9, 36])
    assert seg1 is not None and seg1["g_tot"] >= 3 + 6


def test_dense_refine_rejects_out_of_range_edges():
    """Concrete out-of-range endpoints raise instead of clamping under jit
    (round-4 review item 7 — parity with the sharded path's validation)."""
    import pytest

    m = 5
    gt = _circle_traj(m)
    R0, t0 = _stack(gt)
    bad = EdgeList(
        i=jnp.array([0], jnp.int32), j=jnp.array([m], jnp.int32),
        R=jnp.eye(3)[None], t=jnp.zeros((1, 3)), weight=jnp.ones(1),
    )
    with pytest.raises(ValueError, match="out of range"):
        refine_pose_graph(R0, t0, bad, n_iters=2)
