import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgmm.data.synthetic import make_cloud, perturb
from hgmm.eval.metrics import registration_rmse, rotation_error_deg
from hgmm.models.gmm import Gmm
from hgmm.models.pose import weighted_umeyama
from hgmm.models.se3 import Pose, random_pose, so3_exp
from hgmm.pipelines.register import register_pair, register_points


def test_weighted_umeyama_exact():
    """Noiseless paired clouds -> machine-precision pose (SURVEY.md §5.2)."""
    pts = jax.random.normal(jax.random.PRNGKey(0), (200, 3))
    gt = random_pose(jax.random.PRNGKey(1), max_angle=1.5, max_trans=2.0)
    est = weighted_umeyama(pts, gt.apply(pts))
    np.testing.assert_allclose(est.R, gt.R, atol=1e-5)
    np.testing.assert_allclose(est.t, gt.t, atol=1e-5)


def test_weighted_umeyama_weights():
    """Outlier rows with zero weight are ignored."""
    pts = jax.random.normal(jax.random.PRNGKey(2), (100, 3))
    gt = random_pose(jax.random.PRNGKey(3))
    tgt = gt.apply(pts)
    bad = tgt.at[:10].set(50.0)
    w = jnp.ones(100).at[:10].set(0.0)
    est = weighted_umeyama(pts, bad, w)
    np.testing.assert_allclose(est.R, gt.R, atol=1e-4)
    np.testing.assert_allclose(est.t, gt.t, atol=1e-4)


@pytest.mark.parametrize("method", ["horn", "wls", "horn+wls"])
def test_register_flat_recovers_pose(method):
    """Config 1: flat K-GMM registration on a perturbed copy (BASELINE.json:7)."""
    cloud = make_cloud(jax.random.PRNGKey(4), 2000, kind="trefoil")
    gt = Pose(so3_exp(jnp.array([0.0, 0.0, 0.25])), jnp.array([0.05, -0.04, 0.06]))
    # source in its own frame: gt maps source -> target
    source = gt.inverse().apply(cloud)
    gmm, _ = Gmm.fit(cloud, k=32, n_iters=25, key=jax.random.PRNGKey(5))
    res = register_points(source, gmm.params, n_iters=40, method=method)
    err = registration_rmse(res.pose, source, gt)
    assert float(err) < 0.03, (method, float(err))
    assert float(rotation_error_deg(res.pose, gt)) < 3.0
    from hgmm.eval.metrics import pose_delta_norm, translation_error

    assert float(translation_error(res.pose, gt)) < 0.02
    assert float(pose_delta_norm(res.pose, gt)) < 0.06


def test_register_pair_end_to_end_flat():
    cloud = make_cloud(jax.random.PRNGKey(6), 1500, kind="helix")
    gt = random_pose(jax.random.PRNGKey(7), max_angle=0.2, max_trans=0.05)
    source = perturb(jax.random.PRNGKey(8), cloud, gt.inverse(), noise=0.002)
    res = register_pair(
        source,
        target=cloud,
        model_kind="flat",
        k=32,
        fit_iters=20,
        key=jax.random.PRNGKey(9),
        n_iters=40,
    )
    err = registration_rmse(res.pose, source, gt)
    assert float(err) < 0.05, float(err)


def test_register_with_outliers():
    """Config 3 robustness: outlier component downweights junk points."""
    cloud = make_cloud(jax.random.PRNGKey(10), 1500, kind="trefoil")
    gt = random_pose(jax.random.PRNGKey(11), max_angle=0.15, max_trans=0.04)
    source = gt.inverse().apply(cloud)
    junk = jax.random.uniform(jax.random.PRNGKey(12), (150, 3), minval=-2, maxval=2)
    source_noisy = jnp.concatenate([source, junk])
    gmm, _ = Gmm.fit(cloud, k=32, n_iters=25, key=jax.random.PRNGKey(13))
    res = register_points(
        source_noisy, gmm.params, n_iters=40, method="horn+wls", outlier_logit=0.0
    )
    err = registration_rmse(res.pose, source, gt)
    assert float(err) < 0.05, float(err)


def test_converged_scan_reports_last_live_loglik():
    """Post-convergence iterations re-emit the LAST live (loglik, delta) —
    a zero sentinel there once let early-converged loop-closure candidates
    report loglik 0 and pass the quality gate (round-4 review item 1)."""
    cloud = make_cloud(jax.random.PRNGKey(10), 1500, kind="trefoil")
    gmm, _ = Gmm.fit(cloud, k=16, n_iters=15, key=jax.random.PRNGKey(11))
    res = register_points(
        cloud, gmm.params, n_iters=40, method="horn", tol=1e-5
    )
    assert bool(res.converged)
    deltas = np.asarray(res.deltas)
    lls = np.asarray(res.logliks)
    live = np.flatnonzero(deltas >= 1e-5)
    last_live = (live[-1] + 1) if live.size else 0
    assert last_live < 39, "did not converge early enough to test the skip"
    # Every skipped slot repeats the converged values exactly.
    np.testing.assert_array_equal(lls[last_live:], lls[last_live])
    np.testing.assert_array_equal(deltas[last_live:], deltas[last_live])
    assert lls[-1] != 0.0
