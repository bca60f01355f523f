"""Integration acceptance tests for the five BASELINE.json benchmark
configs (CPU-scale versions; SURVEY.md §5.2 integration + golden rows)."""

import jax
import jax.numpy as jnp
import numpy as np

from hgmm.configs.presets import PRESETS
from hgmm.data.synthetic import make_cloud, perturb
from hgmm.eval.metrics import registration_rmse, rotation_error_deg
from hgmm.models.gmm_tree import GmmTree
from hgmm.models.se3 import Pose, random_pose, so3_exp
from hgmm.parallel import make_mesh
from hgmm.pipelines.odometry import OdometryConfig, run_odometry
from hgmm.pipelines.register import register_pair, register_points


def test_presets_exist():
    assert set(PRESETS) == {
        "config1_flat64",
        "config2_tree_8x3",
        "config3_mahalanobis",
        "config4_kitti_odometry",
        "config5_distributed",
    }


def test_config2_tree_registration():
    """Hierarchical tree registration on a structured cloud (config 2)."""
    cloud = make_cloud(jax.random.PRNGKey(0), 4000, kind="trefoil")
    gt = random_pose(jax.random.PRNGKey(1), max_angle=0.2, max_trans=0.05)
    source = gt.inverse().apply(cloud)
    res = register_pair(
        source, target=cloud, model_kind="tree", branch=8, levels=2,
        fit_iters=10, n_iters=40, key=jax.random.PRNGKey(2),
    )
    assert float(registration_rmse(res.pose, source, gt)) < 0.03
    assert float(rotation_error_deg(res.pose, gt)) < 2.0


def test_config2_adaptive_cut_registration():
    """Adaptive-scale association (arXiv 1807.02587's headline feature):
    register against the mixed-resolution complexity cut instead of pure
    leaves. The cut must (a) actually shrink the mixture the kernels see,
    and (b) match pure-leaf registration quality."""
    from hgmm.models.gmm_tree import node_complexity

    cloud = make_cloud(jax.random.PRNGKey(0), 4000, kind="trefoil")
    gt = random_pose(jax.random.PRNGKey(1), max_angle=0.2, max_trans=0.05)
    source = gt.inverse().apply(cloud)
    tree, _ = GmmTree.fit(cloud, branch=8, levels=3, em_iters=8,
                          key=jax.random.PRNGKey(2))
    comp = node_complexity(tree.levels[-2])
    thr = float(jnp.quantile(comp, 0.5))  # coarsen ~half the parents
    cut = tree.cut_mixture(thr)
    assert cut.pi.shape[0] < tree.n_leaves  # fewer components than leaves
    from hgmm.pipelines.register import register_tree

    res = register_tree(
        source, tree, n_iters=40, method="horn+wls",
        complexity_threshold=thr,
    )
    assert float(registration_rmse(res.pose, source, gt)) < 0.03
    assert float(rotation_error_deg(res.pose, gt)) < 2.0


def test_config3_noisy_partial_overlap():
    """Anisotropic + Mahalanobis + outlier gating on noisy partial overlap
    (config 3)."""
    cloud = make_cloud(jax.random.PRNGKey(3), 5000, kind="trefoil")
    gt = random_pose(jax.random.PRNGKey(4), max_angle=0.15, max_trans=0.04)
    source = perturb(
        jax.random.PRNGKey(5), cloud, gt.inverse(), noise=0.004,
        keep_fraction=0.7,
    )
    tree, _ = GmmTree.fit(cloud, branch=8, levels=2, em_iters=10,
                          key=jax.random.PRNGKey(6))
    res = register_points(
        source, tree.cut_mixture(0.0), n_iters=40, method="horn+wls",
        outlier_logit=0.0, top_k=8,
    )
    assert float(registration_rmse(res.pose, source, gt)) < 0.05
    assert float(rotation_error_deg(res.pose, gt)) < 3.0


def test_config5_sharded_odometry():
    """Distributed odometry: sharded tree fit + sharded registration per
    frame over the fake 8-device mesh (config 5)."""
    scene = make_cloud(jax.random.PRNGKey(7), 2000, kind="helix")
    step = Pose(so3_exp(jnp.array([0.0, 0.0, 0.05])), jnp.array([0.04, 0.0, 0.0]))
    gt = [Pose.identity()]
    for _ in range(2):
        gt.append(gt[-1].compose(step))
    frames = [np.asarray(g.inverse().apply(scene)) for g in gt]
    cfg = OdometryConfig(
        model_kind="tree", branch=8, levels=2, fit_iters=6, reg_iters=15,
        bucket=2048,
    )
    res = run_odometry(frames, cfg, mesh=make_mesh())
    assert len(res.abs_poses) == 3
    from hgmm.eval.metrics import ate

    assert float(ate(res.abs_poses, gt)) < 0.02


def test_golden_transform_regression():
    """Golden-file regression: fixed seed end-to-end transform must stay
    stable across refactors (update deliberately if algorithm changes)."""
    cloud = make_cloud(jax.random.PRNGKey(42), 2000, kind="trefoil")
    gt = Pose(so3_exp(jnp.array([0.05, -0.03, 0.2])), jnp.array([0.04, -0.02, 0.05]))
    source = gt.inverse().apply(cloud)
    res = register_pair(
        source, target=cloud, model_kind="flat", k=32, fit_iters=15,
        n_iters=30, key=jax.random.PRNGKey(43), method="horn+wls",
    )
    # The recovered pose must match ground truth tightly (golden bound).
    np.testing.assert_allclose(res.pose.R, gt.R, atol=2e-3)
    np.testing.assert_allclose(res.pose.t, gt.t, atol=2e-3)
