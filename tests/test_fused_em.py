"""Pallas kernel == dense jnp twin equivalence suite (SURVEY.md §5.2:
"every Pallas kernel ships with a jnp twin, tested against each other").

On CPU these run the kernels in interpret mode; with HGMM_TEST_TPU=1 the
same assertions run compiled on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgmm.models.se3 import random_pose
from hgmm.ops import em_ref, fused_em
from hgmm.ops.gaussians import MixtureParams, pack_loglik_weights, precision_terms, sym_pack

TILE = 256


def _mixture(key, k):
    k1, k2, k3 = jax.random.split(key, 3)
    mu = jax.random.normal(k1, (k, 3))
    a = 0.3 * jax.random.normal(k2, (k, 3, 3))
    sigma = jnp.einsum("kij,klj->kil", a, a) + 0.05 * jnp.eye(3)
    pi = jax.nn.softmax(jax.random.normal(k3, (k,)))
    return MixtureParams(pi, mu, sigma)


def _points(key, n=300):
    return jax.random.normal(key, (n, 3))


@pytest.mark.parametrize("k", [12, 64])
def test_em_stats_equivalence(k):
    """Fast (hi/lo-bf16) path: gamma is single-rounded bf16, so per-entry
    stats carry ~2^-9 RNE noise that averages out over points."""
    params = _mixture(jax.random.PRNGKey(0), k)
    pts = _points(jax.random.PRNGKey(1))
    W = pack_loglik_weights(params)
    ref = em_ref.em_stats(pts, W)
    got = fused_em.em_stats(pts, W, tile=TILE)
    np.testing.assert_allclose(got.S, ref.S, rtol=2e-2, atol=5e-3)
    # loglik normalizer sums bf16 exp2 outputs -> ~2^-9-relative noise.
    np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-3)


@pytest.mark.parametrize("k", [12, 64])
def test_em_stats_equivalence_strict(k):
    """Strict (fp32 HIGHEST) path matches the dense twin tightly."""
    params = _mixture(jax.random.PRNGKey(0), k)
    pts = _points(jax.random.PRNGKey(1))
    W = pack_loglik_weights(params)
    ref = em_ref.em_stats(pts, W)
    got = fused_em.em_stats(pts, W, tile=TILE, precision="strict")
    np.testing.assert_allclose(got.S, ref.S, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-4)


def test_em_stats_weights_and_outlier():
    params = _mixture(jax.random.PRNGKey(2), 16)
    pts = _points(jax.random.PRNGKey(3), 200)
    w = jax.random.uniform(jax.random.PRNGKey(4), (200,))
    W = pack_loglik_weights(params)
    ref = em_ref.em_stats(pts, W, w, outlier_logit=-3.0)
    got = fused_em.em_stats(pts, W, w, outlier_logit=-3.0, tile=TILE)
    np.testing.assert_allclose(got.S, ref.S, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-3)


@pytest.mark.parametrize("precision", ["fast", "strict"])
def test_em_stats_outlier_dominated(precision):
    """Round-1 advisor finding: when the outlier logit exceeds every
    Gaussian logit by far (points >>sigma from all components — the regime
    outlier gating targets), lse must converge to the outlier logit, not
    saturate at a clamp. Stats stay ~0 either way."""
    params = _mixture(jax.random.PRNGKey(30), 8)
    # Points 50+ units away from every component: gaussian logits ~ -1e4.
    pts = _points(jax.random.PRNGKey(31), 128) + 50.0
    W = pack_loglik_weights(params)
    for outlier in (-3.0, -80.0):
        ref = em_ref.em_stats(pts, W, outlier_logit=outlier)
        got = fused_em.em_stats(
            pts, W, outlier_logit=outlier, tile=128, precision=precision
        )
        np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-4)
        np.testing.assert_allclose(got.S, ref.S, atol=1e-6)


def test_em_stats_far_point_mixed():
    """One far point among normal ones, WITH an outlier component: the far
    column is outlier-dominated (exact in both paths); near columns match
    the dense twin as usual."""
    params = _mixture(jax.random.PRNGKey(32), 16)
    pts = _points(jax.random.PRNGKey(33), 255)
    pts = jnp.concatenate([pts, jnp.full((1, 3), 40.0)], axis=0)
    W = pack_loglik_weights(params)
    ref = em_ref.em_stats(pts, W, outlier_logit=-5.0)
    got = fused_em.em_stats(pts, W, outlier_logit=-5.0, tile=128)
    np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-3)
    np.testing.assert_allclose(got.S, ref.S, rtol=2e-2, atol=5e-3)


def test_reg_stats_outlier_dominated():
    """Registration twin of the advisor case: far source cloud + outlier."""
    params = _mixture(jax.random.PRNGKey(34), 8)
    pts = _points(jax.random.PRNGKey(35), 128) + 30.0
    pose = random_pose(jax.random.PRNGKey(36))
    W = pack_loglik_weights(params)
    A, b, _ = precision_terms(params)
    ref = em_ref.reg_stats(
        pts, W, params.mu, sym_pack(A), b, (pose.R, pose.t), outlier_logit=-2.0
    )
    got = fused_em.reg_stats(
        pts, W, params.mu, sym_pack(A), b, (pose.R, pose.t),
        outlier_logit=-2.0, tile=128,
    )
    np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-4)
    np.testing.assert_allclose(got.A, ref.A, atol=1e-4)
    np.testing.assert_allclose(got.b, ref.b, atol=1e-4)


def test_em_stats_masked_equivalence():
    params = _mixture(jax.random.PRNGKey(5), 32)  # 4 parents x 8 children
    pts = _points(jax.random.PRNGKey(6), 300)
    parent = jax.random.randint(jax.random.PRNGKey(7), (300,), 0, 4)
    W = pack_loglik_weights(params)
    ref = em_ref.em_stats_masked(pts, W, parent, 8)
    got = fused_em.em_stats_masked(pts, W, parent, 8, tile=TILE)
    np.testing.assert_allclose(got.S, ref.S, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-3)


def test_assign_equivalence():
    params = _mixture(jax.random.PRNGKey(8), 24)
    pts = _points(jax.random.PRNGKey(9), 300)
    W = pack_loglik_weights(params)
    np.testing.assert_array_equal(
        fused_em.assign(pts, W, tile=TILE), em_ref.assign(pts, W)
    )
    parent = jax.random.randint(jax.random.PRNGKey(10), (300,), 0, 3)
    np.testing.assert_array_equal(
        fused_em.assign(pts, W, parent, 8, tile=TILE),
        em_ref.assign(pts, W, parent, 8),
    )


@pytest.mark.parametrize("top_k,outlier", [(None, None), (4, None), (None, -2.0)])
def test_reg_stats_equivalence(top_k, outlier):
    params = _mixture(jax.random.PRNGKey(11), 16)
    pts = _points(jax.random.PRNGKey(12), 300)
    pose = random_pose(jax.random.PRNGKey(13))
    W = pack_loglik_weights(params)
    A, b, _ = precision_terms(params)
    A6 = sym_pack(A)
    ref = em_ref.reg_stats(
        pts, W, params.mu, A6, b, (pose.R, pose.t), top_k=top_k,
        outlier_logit=outlier,
    )
    got = fused_em.reg_stats(
        pts, W, params.mu, A6, b, (pose.R, pose.t), top_k=top_k,
        outlier_logit=outlier, tile=TILE,
    )
    np.testing.assert_allclose(got.horn, ref.horn, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(got.A, ref.A, rtol=1e-2, atol=2e-1)
    np.testing.assert_allclose(got.b, ref.b, rtol=1e-2, atol=2e-1)
    np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-3)


def test_reg_stats_point_weights():
    params = _mixture(jax.random.PRNGKey(14), 8)
    pts = _points(jax.random.PRNGKey(15), 200)
    w = (jax.random.uniform(jax.random.PRNGKey(16), (200,)) > 0.3).astype(jnp.float32)
    pose = random_pose(jax.random.PRNGKey(17))
    W = pack_loglik_weights(params)
    A, b, _ = precision_terms(params)
    ref = em_ref.reg_stats(pts, W, params.mu, sym_pack(A), b, (pose.R, pose.t), w)
    got = fused_em.reg_stats(
        pts, W, params.mu, sym_pack(A), b, (pose.R, pose.t), w, tile=TILE
    )
    np.testing.assert_allclose(got.horn, ref.horn, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(got.A, ref.A, rtol=1e-2, atol=2e-1)
    np.testing.assert_allclose(got.b, ref.b, rtol=1e-2, atol=2e-1)


def test_reg_stats_equivalence_strict():
    params = _mixture(jax.random.PRNGKey(21), 16)
    pts = _points(jax.random.PRNGKey(22), 300)
    pose = random_pose(jax.random.PRNGKey(23))
    W = pack_loglik_weights(params)
    A, b, _ = precision_terms(params)
    ref = em_ref.reg_stats(pts, W, params.mu, sym_pack(A), b, (pose.R, pose.t))
    got = fused_em.reg_stats(
        pts, W, params.mu, sym_pack(A), b, (pose.R, pose.t),
        precision="strict", tile=TILE,
    )
    np.testing.assert_allclose(got.horn, ref.horn, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got.A, ref.A, rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(got.b, ref.b, rtol=2e-3, atol=2e-2)


def test_subtile_must_divide_tile(monkeypatch):
    """A HGMM_SUBTILE that does not divide the point tile must fail loudly
    (advisor round-2 medium finding: the sub-tiled body otherwise silently
    drops the remainder columns from the stats)."""
    params = _mixture(jax.random.PRNGKey(30), 16)
    pts = _points(jax.random.PRNGKey(31))
    W = pack_loglik_weights(params)
    monkeypatch.setattr(fused_em, "_SUBTILE", 3)
    with pytest.raises(ValueError, match="HGMM_SUBTILE"):
        fused_em.em_stats(pts, W, tile=TILE)
    # A dividing value still runs and matches the twin.
    monkeypatch.setattr(fused_em, "_SUBTILE", 2)
    ref = em_ref.em_stats(pts, W)
    got = fused_em.em_stats(pts, W, tile=TILE)
    np.testing.assert_allclose(got.S, ref.S, rtol=2e-2, atol=5e-3)


def test_fast_path_with_dead_components():
    """A mixture containing pi=0 (dead) components must neither blow up the
    fast path's shift margin (dead c ~ +2e30 is excluded from the bound)
    nor change equivalence with the dense twin."""
    params = _mixture(jax.random.PRNGKey(40), 16)
    pi = params.pi.at[3].set(0.0).at[11].set(0.0)
    pi = pi / jnp.sum(pi)
    params = MixtureParams(pi, params.mu, params.sigma)
    pts = _points(jax.random.PRNGKey(41))
    W = pack_loglik_weights(params)
    from hgmm.ops.gaussians import fast_logit_margin

    margin = float(fast_logit_margin(W, jnp.max(jnp.abs(pts))))
    assert margin < 1.0, margin  # healthy live components: sub-nat margin
    ref = em_ref.em_stats(pts, W)
    got = fused_em.em_stats(pts, W, tile=TILE)
    np.testing.assert_allclose(got.S, ref.S, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-3)
    assert float(jnp.max(jnp.abs(got.S[jnp.array([3, 11])]))) == 0.0


def test_hi_lo_split_survives_jit():
    """Convert-folding regression guard: under jit, XLA's algebraic
    simplifier folds f32->bf16->f32 convert pairs (allow-excess-precision),
    which silently zeroed the lo half of the hi/lo splits — every jitted
    production pipeline then ran the 'fp32-accurate' fast path at raw bf16
    logit accuracy, overflowing the global-shift softmax bound and NaN-ing
    whole tree fits on the real chip (observed 2026-08-20). The trace-level
    splits must use lax.reduce_precision, whose rounding the simplifier
    cannot elide."""
    x = jax.random.normal(jax.random.PRNGKey(50), (64, 16)) * 1e5

    def lo_norm(x):
        hi, lo = fused_em._split_hi_lo(x)
        return jnp.sum(jnp.abs(lo.astype(jnp.float32)))

    def lo3_norm(x):
        hi, mid, lo = fused_em._split3(x)
        return (jnp.sum(jnp.abs(mid.astype(jnp.float32))),
                jnp.sum(jnp.abs(lo.astype(jnp.float32))))

    eager = float(lo_norm(x))
    jitted = float(jax.jit(lo_norm)(x))
    assert eager > 0.0
    # reduce_precision vs convert may RNE ties differently; the residual
    # magnitude must survive jit (the folding bug returned exactly 0).
    assert jitted > 0.5 * eager, (eager, jitted)
    m_e, l_e = (float(v) for v in lo3_norm(x))
    m_j, l_j = (float(v) for v in jax.jit(lo3_norm)(x))
    assert m_e > 0.0 and l_e > 0.0
    assert m_j > 0.5 * m_e and l_j > 0.1 * l_e, (m_e, l_e, m_j, l_j)


def test_backend_override_dispatch():
    """ops.set_backend forces the dispatcher (get_backend restores): "ref"
    pins the dense twins even where pallas would be picked, and bogus
    names raise (round-3 advisor item 5: API guards are errors, not
    asserts)."""
    from hgmm import ops

    pts = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    prev = ops.get_backend()
    try:
        ops.set_backend("ref")
        assert not ops._pallas_active()
        prep = ops.prepare(pts)
        assert prep.phiw is None and prep.points is not None
        ops.set_backend("pallas")
        assert ops._pallas_active()
        with pytest.raises(ValueError):
            ops.set_backend("bogus")
        with pytest.raises(ValueError):
            ops.em_stats(prep, jnp.zeros((10, 4)), point_weights=jnp.ones(64))
    finally:
        ops.set_backend(prev)


def test_ksplit_body_matches_ref():
    """HGMM_KSPLIT measurement branch (K-chunked logits/exp2/stats with a
    full-K normalizer): identical math to the single-chunk body."""
    from hgmm.ops import fused_em

    params = _mixture(jax.random.PRNGKey(31), 64)
    pts = jax.random.normal(jax.random.PRNGKey(32), (400, 3))
    W = pack_loglik_weights(params)
    ref = em_ref.em_stats(pts, W)
    old = fused_em._KSPLIT
    fused_em._KSPLIT = 2
    try:
        got = fused_em.em_stats(pts, W, tile=256)
    finally:
        fused_em._KSPLIT = old
    np.testing.assert_allclose(got.S, ref.S, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(got.loglik, ref.loglik, rtol=1e-3)


def test_slim_phi_modes_match_oracle():
    """The HGMM_SLIM_PHI measurement switch selects import-time kernel/
    layout variants (0 = dual stream, 1 = reconstruct-f32, 2 = shipped
    distinct-rows stream); CI otherwise only ever runs the default, so a
    rotted fallback layout would surface mid-measurement on the chip.
    Each mode runs in a subprocess (the flag is read at import) against
    the dense oracle in interpret mode."""
    import subprocess
    import sys
    from pathlib import Path

    prog = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from hgmm.ops import em_ref, fused_em\n"
        "from hgmm.ops.gaussians import MixtureParams, pack_loglik_weights\n"
        "k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(0), 5)\n"
        "mu = jax.random.normal(k1, (24, 3))\n"
        "a = 0.3 * jax.random.normal(k2, (24, 3, 3))\n"
        "sigma = jnp.einsum('kij,klj->kil', a, a) + 0.05 * jnp.eye(3)\n"
        "params = MixtureParams(jax.nn.softmax(jax.random.normal(k3, (24,))), mu, sigma)\n"
        "pts = jax.random.normal(k4, (300, 3))\n"
        "W = pack_loglik_weights(params)\n"
        "ref = em_ref.em_stats(pts, W)\n"
        "got = fused_em.em_stats(pts, W, tile=256)\n"
        "np.testing.assert_allclose(got.S, ref.S, rtol=2e-2, atol=5e-3)\n"
        "par = jax.random.randint(k5, (300,), 0, 3)\n"
        "refm = em_ref.em_stats_masked(pts, W, par, 8)\n"
        "gotm = fused_em.em_stats_masked(pts, W, par, 8, tile=256)\n"
        "np.testing.assert_allclose(gotm.S, refm.S, rtol=2e-2, atol=5e-3)\n"
        "print('mode ok')\n"
    )
    import os

    repo = str(Path(__file__).resolve().parents[1])
    for mode in ("0", "1", "2"):
        env = dict(os.environ, HGMM_SLIM_PHI=mode)
        env.pop("XLA_FLAGS", None)  # single-device CPU is enough
        r = subprocess.run(
            [sys.executable, "-c", prog], env=env, cwd=repo,
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0 and "mode ok" in r.stdout, (
            f"HGMM_SLIM_PHI={mode} failed:\n{r.stdout}\n{r.stderr}"
        )
