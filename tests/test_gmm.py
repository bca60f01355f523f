import jax
import jax.numpy as jnp
import numpy as np

from hgmm.data.synthetic import sample_gmm
from hgmm.models.gmm import Gmm, em_fit, init_params
from hgmm.ops.gaussians import MixtureParams


def _well_separated(dtype=jnp.float32):
    mu = jnp.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0], [0.0, 5.0, 5.0]], dtype)
    sigma = jnp.stack([jnp.eye(3, dtype=dtype) * s for s in (0.2, 0.1, 0.3)])
    pi = jnp.array([0.5, 0.3, 0.2], dtype)
    return MixtureParams(pi, mu, sigma)


def test_em_recovers_well_separated_mixture():
    true = _well_separated()
    pts = sample_gmm(jax.random.PRNGKey(0), true, 6000)
    gmm, logliks = Gmm.fit(pts, k=3, n_iters=40, key=jax.random.PRNGKey(1))
    est = gmm.params
    # Match components by nearest mean.
    order = [int(jnp.argmin(jnp.sum((est.mu - m) ** 2, axis=1))) for m in true.mu]
    assert len(set(order)) == 3, "components collapsed"
    np.testing.assert_allclose(est.mu[jnp.array(order)], true.mu, atol=0.15)
    np.testing.assert_allclose(est.pi[jnp.array(order)], true.pi, atol=0.05)


def test_em_loglik_monotone():
    true = _well_separated()
    pts = sample_gmm(jax.random.PRNGKey(2), true, 3000)
    init = init_params(pts, 8, jax.random.PRNGKey(3))
    _, logliks = em_fit(pts, init, n_iters=25)
    ll = np.asarray(logliks)
    # EM is monotone up to fp noise.
    assert np.all(np.diff(ll) > -np.abs(ll[0]) * 1e-5), ll


def test_em_point_weights_padding_invariance():
    """Padding points with zero weight must not change the fit."""
    true = _well_separated()
    pts = sample_gmm(jax.random.PRNGKey(4), true, 1000)
    init = init_params(pts, 4, jax.random.PRNGKey(5))
    params_a, _ = em_fit(pts, init, n_iters=10)
    padded = jnp.concatenate([pts, jnp.full((128, 3), 1e3, pts.dtype)])
    w = jnp.concatenate([jnp.ones(1000), jnp.zeros(128)])
    params_b, _ = em_fit(padded, init, n_iters=10, point_weights=w)
    np.testing.assert_allclose(params_b.mu, params_a.mu, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(params_b.pi, params_a.pi, rtol=1e-3, atol=1e-5)


def test_fit_is_jittable_and_deterministic():
    pts = sample_gmm(jax.random.PRNGKey(6), _well_separated(), 2000)
    g1, _ = Gmm.fit(pts, k=4, n_iters=5, key=jax.random.PRNGKey(7))
    g2, _ = Gmm.fit(pts, k=4, n_iters=5, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(g1.params.mu, g2.params.mu)


def test_init_params_never_seeds_padding_origin():
    """Round-3 verdict item 6: zero-weight padding rows (bucketize pads
    zeros at the origin) must never be drawn as initial means, and the
    bounding-box scale must come from the live points only."""
    from hgmm.models.gmm import init_params

    key = jax.random.PRNGKey(0)
    pts = 5.0 + 0.5 * jax.random.normal(key, (100, 3))  # live, far from 0
    padded = jnp.concatenate([pts, jnp.zeros((156, 3))])
    w = jnp.concatenate([jnp.ones(100), jnp.zeros(156)])
    for seed in range(5):
        init = init_params(padded, 16, jax.random.PRNGKey(seed), point_weights=w)
        d = jnp.linalg.norm(init.mu, axis=1)
        assert float(jnp.min(d)) > 1.0, "mean seeded at the padding origin"
    # Bbox scale from live points (~3 units), not the 0..6.5 padded box.
    unweighted = init_params(pts, 16, key)
    np.testing.assert_allclose(
        np.asarray(init.sigma[0]), np.asarray(unweighted.sigma[0]), rtol=0.5
    )


def test_init_params_raises_on_too_few_live_points():
    """Eager guard: fewer positive-weight points than components must be a
    loud error, not silent padding-origin means (review follow-up)."""
    import pytest

    from hgmm.models.gmm import init_params

    pts = jnp.concatenate([jnp.ones((5, 3)), jnp.zeros((95, 3))])
    w = jnp.concatenate([jnp.ones(5), jnp.zeros(95)])
    with pytest.raises(ValueError, match="positive-weight"):
        init_params(pts, 16, jax.random.PRNGKey(0), point_weights=w)
