"""Distributed-without-a-cluster tests (SURVEY.md §5.2): the REAL multi-host
code path — Mesh + shard_map + psum — on 8 fake CPU devices, asserting
sharded results match the single-device implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgmm.data.synthetic import make_cloud, sample_gmm
from hgmm.eval.metrics import registration_rmse
from hgmm.models.gmm import Gmm, em_fit, init_params
from hgmm.models.se3 import random_pose
from hgmm.ops.gaussians import MixtureParams
from hgmm.parallel import make_mesh, sharded_em_fit, sharded_register_points, sharded_tree_fit
from hgmm.pipelines.register import register_points


def _mix():
    mu = jnp.array([[0.0, 0.0, 0.0], [4.0, 0.0, 0.0], [0.0, 4.0, 4.0]])
    sigma = jnp.stack([jnp.eye(3) * s for s in (0.2, 0.1, 0.3)])
    return MixtureParams(jnp.array([0.5, 0.3, 0.2]), mu, sigma)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8, "conftest should provide 8 fake devices"


def test_sharded_em_matches_single_device():
    pts = sample_gmm(jax.random.PRNGKey(0), _mix(), 4096)
    init = init_params(pts, 4, jax.random.PRNGKey(1))
    single, ll_s = em_fit(pts, init, n_iters=8)
    mesh = make_mesh()
    shard, ll_d = sharded_em_fit(pts, init, mesh, n_iters=8)
    np.testing.assert_allclose(shard.mu, single.mu, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(shard.pi, single.pi, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(shard.sigma, single.sigma, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(ll_d, ll_s, rtol=1e-5)


def test_sharded_em_ragged_n():
    """N not divisible by n_devices: zero-weight padding must not change
    the fit."""
    pts = sample_gmm(jax.random.PRNGKey(2), _mix(), 4001)
    init = init_params(pts, 4, jax.random.PRNGKey(3))
    single, _ = em_fit(pts, init, n_iters=6)
    shard, _ = sharded_em_fit(pts, init, make_mesh(), n_iters=6)
    np.testing.assert_allclose(shard.mu, single.mu, rtol=1e-4, atol=1e-5)


def test_sharded_register_matches_single():
    cloud = make_cloud(jax.random.PRNGKey(4), 2048, kind="trefoil")
    gt = random_pose(jax.random.PRNGKey(5), max_angle=0.2, max_trans=0.05)
    source = gt.inverse().apply(cloud)
    gmm, _ = Gmm.fit(cloud, k=16, n_iters=15, key=jax.random.PRNGKey(6))
    single = register_points(source, gmm.params, n_iters=25)
    shard = sharded_register_points(source, gmm.params, make_mesh(), n_iters=25)
    np.testing.assert_allclose(shard.pose.R, single.pose.R, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(shard.pose.t, single.pose.t, rtol=1e-3, atol=1e-4)
    err = registration_rmse(shard.pose, source, gt)
    assert float(err) < 0.05


def test_sharded_tree_fit_runs_and_models_data():
    pts = make_cloud(jax.random.PRNGKey(7), 2048, kind="helix")
    tree = sharded_tree_fit(pts, make_mesh(), branch=8, levels=2, em_iters=6)
    assert tree.levels[0].pi.shape == (8,)
    assert tree.levels[1].pi.shape == (64,)
    from hgmm.models.gmm import log_likelihood

    ll_leaf = float(log_likelihood(tree.levels[1], pts))
    ll_root = float(log_likelihood(tree.levels[0], pts))
    assert ll_leaf > ll_root


def test_sharded_em_fit_pads_weighted_nondivisible_n():
    """Weighted points with N not divisible by the device count must pad
    (round-4 review item 3: previously crashed in shard_map)."""
    from hgmm.data.synthetic import make_cloud
    from hgmm.models.gmm import init_params
    from hgmm.parallel import make_mesh, sharded_em_fit

    pts = make_cloud(jax.random.PRNGKey(0), 1001, kind="helix")
    w = jnp.ones((1001,))
    mesh = make_mesh()
    params, lls = sharded_em_fit(
        pts, init_params(pts, 8, jax.random.PRNGKey(1), point_weights=w),
        mesh, n_iters=3, point_weights=w,
    )
    assert bool(jnp.all(jnp.isfinite(params.mu)))
