import jax
import jax.numpy as jnp
import numpy as np

from hgmm.data.synthetic import make_cloud
from hgmm.models.gmm import Gmm
from hgmm.models.gmm_tree import GmmTree, node_complexity, seed_children
from hgmm.ops.gaussians import MixtureParams


def _cloud(n=3000):
    return make_cloud(jax.random.PRNGKey(0), n, kind="trefoil")


def test_tree_shapes():
    tree, logliks = GmmTree.fit(_cloud(), branch=8, levels=3, em_iters=6)
    assert len(tree.levels) == 3
    for l, p in enumerate(tree.levels):
        assert p.pi.shape == (8 ** (l + 1),)
        assert p.mu.shape == (8 ** (l + 1), 3)
        assert p.sigma.shape == (8 ** (l + 1), 3, 3)
    assert tree.n_leaves == 512
    assert logliks.shape == (3,)


def test_tree_level_weights_normalized():
    tree, _ = GmmTree.fit(_cloud(), branch=8, levels=2, em_iters=8)
    for p in tree.levels:
        np.testing.assert_allclose(float(jnp.sum(p.pi)), 1.0, atol=1e-3)


def test_tree_loglik_improves_with_depth():
    """Leaf mixture models the data at least as well as level 0
    (SURVEY.md §5.2 tree invariants)."""
    pts = _cloud()
    tree, logliks = GmmTree.fit(pts, branch=8, levels=3, em_iters=8)
    ll = np.asarray(logliks)
    assert ll[-1] > ll[0], ll


def test_tree_beats_flat_same_k():
    """512 leaves should model better than flat K=8 (coarse)."""
    pts = _cloud(2000)
    tree, _ = GmmTree.fit(pts, branch=8, levels=2, em_iters=10)
    flat8, _ = Gmm.fit(pts, k=8, n_iters=10, key=jax.random.PRNGKey(1))
    from hgmm.models.gmm import log_likelihood

    assert float(log_likelihood(tree.leaf_mixture(), pts)) > float(
        log_likelihood(flat8.params, pts)
    )


def test_seed_children_preserves_mass():
    p = MixtureParams(
        pi=jnp.array([0.6, 0.4]),
        mu=jnp.zeros((2, 3)),
        sigma=jnp.stack([jnp.eye(3)] * 2),
    )
    c = seed_children(p, 8)
    assert c.pi.shape == (16,)
    np.testing.assert_allclose(float(jnp.sum(c.pi)), 1.0, atol=1e-6)
    np.testing.assert_allclose(jnp.sum(c.pi[:8]), 0.6, atol=1e-6)


def test_cut_mixture_masses():
    tree, _ = GmmTree.fit(_cloud(2000), branch=8, levels=2, em_iters=6)
    cut = tree.cut_mixture(complexity_threshold=0.2)
    np.testing.assert_allclose(float(jnp.sum(cut.pi)), 1.0, atol=1e-5)
    # pure-leaf cut when threshold 0
    leaf = tree.cut_mixture(0.0)
    assert leaf.pi.shape == (64,)


def test_cut_mixture_compacts_and_preserves_loglik():
    """threshold>0 must SHRINK the mixture the kernels see (host-side
    compaction to a 64-bucket) at bounded model-quality cost: each kept
    coarse node takes exactly its leaves' mass, and the mean per-point
    log-likelihood of the cut stays within 0.5 nat of the pure leaves."""
    from hgmm.models.gmm_tree import node_complexity
    from hgmm.ops import em_ref
    from hgmm.ops.gaussians import pack_loglik_weights

    pts = _cloud(3000)
    tree, _ = GmmTree.fit(pts, branch=8, levels=3, em_iters=8)
    comp = node_complexity(tree.levels[-2])
    thr = float(jnp.quantile(comp, 0.25))  # coarsen the simplest quarter
    cut = tree.cut_mixture(thr)
    leaves = tree.leaf_mixture()
    assert cut.pi.shape[0] % 64 == 0
    assert cut.pi.shape[0] < leaves.pi.shape[0]
    np.testing.assert_allclose(float(jnp.sum(cut.pi)), 1.0, atol=1e-5)
    n = pts.shape[0]
    ll_cut = float(em_ref.em_stats(pts, pack_loglik_weights(cut)).loglik) / n
    ll_leaf = float(em_ref.em_stats(pts, pack_loglik_weights(leaves)).loglik) / n
    assert ll_cut > ll_leaf - 0.5, (ll_cut, ll_leaf)


def test_cut_mixture_all_simple_is_coarse_level():
    """threshold >= max complexity -> the cut IS the coarse level (with
    leaf-mass weights), compacted to its bucket."""
    tree, _ = GmmTree.fit(_cloud(2000), branch=8, levels=2, em_iters=6)
    cut = tree.cut_mixture(complexity_threshold=1.0)
    coarse = tree.levels[0]
    kc = int(jnp.sum(coarse.pi > 0))
    assert int(jnp.sum(cut.pi > 0)) <= kc
    np.testing.assert_allclose(float(jnp.sum(cut.pi)), 1.0, atol=1e-5)


def test_node_complexity_range():
    sigma = jnp.stack([jnp.eye(3), jnp.diag(jnp.array([1.0, 1.0, 1e-4]))])
    c = node_complexity(MixtureParams(jnp.array([0.5, 0.5]), jnp.zeros((2, 3)), sigma))
    assert float(c[0]) > 0.3  # isotropic -> complex
    assert float(c[1]) < 0.01  # planar -> simple


def test_tree_fit_degenerate_curve_data_stays_finite():
    """Regression (round-3 on-chip NaN): fitting a deep tree to noiseless
    curve data collapses leaf covariances; the scale-aware cov floor must
    keep every level finite and the smallest eigenvalue at the floor, and
    the fitted tree must still register."""
    from hgmm.data.synthetic import make_cloud
    from hgmm.models.gmm import scene_variance
    from hgmm.ops.gaussians import sym3_eigvalsh

    pts = make_cloud(jax.random.PRNGKey(4), 4000, kind="trefoil")
    tree, lls = GmmTree.fit(
        pts, branch=8, levels=3, em_iters=20, key=jax.random.PRNGKey(0)
    )
    floor = 1e-4 * float(scene_variance(pts))
    for li, lv in enumerate(tree.levels):
        assert bool(jnp.isfinite(lv.pi).all()), f"level {li} pi"
        assert bool(jnp.isfinite(lv.mu).all()), f"level {li} mu"
        assert bool(jnp.isfinite(lv.sigma).all()), f"level {li} sigma"
        live = np.asarray(lv.pi) > 0
        eigs = np.asarray(sym3_eigvalsh(lv.sigma))[live]
        assert eigs[:, 0].min() >= floor * 0.98, (li, eigs[:, 0].min())
    assert bool(jnp.isfinite(lls).all())
