"""Synthetic point-cloud generators.

The Stanford scans (bunny/dragon/happy-buddha) named by BASELINE.json
configs 1-2 are not redistributable inside this offline environment, so the
test/benchmark clouds are deterministic synthetic stand-ins with similar
structure (curved 2D surfaces embedded in 3D, non-uniform density). Real
scans load through hgmm.data.ply at deployment time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hgmm.models.se3 import Pose
from hgmm.ops.gaussians import MixtureParams


def sample_gmm(key: jax.Array, params: MixtureParams, n: int) -> jax.Array:
    """Draw n points from a mixture (for EM-recovery unit tests)."""
    k_comp, k_norm = jax.random.split(key)
    comp = jax.random.choice(k_comp, params.pi.shape[0], shape=(n,), p=params.pi)
    chol = jnp.linalg.cholesky(params.sigma)  # [K, 3, 3]
    z = jax.random.normal(k_norm, (n, 3), dtype=params.mu.dtype)
    return params.mu[comp] + jnp.einsum("nij,nj->ni", chol[comp], z)


def make_cloud(key: jax.Array, n: int, kind: str = "trefoil") -> jax.Array:
    """Structured surface clouds (bunny stand-ins).

    trefoil: tube around a trefoil knot — curved, self-occluding, unambiguous
             under rigid motion (no rotational symmetry).
    helix:   swept helix ribbon.
    blob:    sample of a random 12-component GMM.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    if kind == "blob":
        km, kc = jax.random.split(k1)
        mu = jax.random.uniform(km, (12, 3), minval=-1.0, maxval=1.0)
        a = 0.15 * jax.random.normal(kc, (12, 3, 3))
        sigma = jnp.einsum("kij,klj->kil", a, a) + 0.01 * jnp.eye(3)
        pi = jnp.full((12,), 1.0 / 12.0)
        return sample_gmm(k2, MixtureParams(pi, mu, sigma), n)

    t = jax.random.uniform(k1, (n,), minval=0.0, maxval=2.0 * jnp.pi)
    if kind == "trefoil":
        cx = jnp.sin(t) + 2.0 * jnp.sin(2.0 * t)
        cy = jnp.cos(t) - 2.0 * jnp.cos(2.0 * t)
        cz = -jnp.sin(3.0 * t)
        center = 0.3 * jnp.stack([cx, cy, cz], axis=-1)
        tube = 0.06
    elif kind == "helix":
        cx = jnp.cos(3.0 * t)
        cy = jnp.sin(3.0 * t)
        cz = t / jnp.pi - 1.0
        center = 0.5 * jnp.stack([cx, cy, cz], axis=-1)
        tube = 0.08
    else:
        raise ValueError(f"unknown cloud kind: {kind}")
    offset = tube * jax.random.normal(k3, (n, 3))
    return (center + offset).astype(jnp.float32)


def perturb(
    key: jax.Array,
    points: jax.Array,
    pose: Pose,
    noise: float = 0.0,
    keep_fraction: float = 1.0,
) -> jax.Array:
    """Apply a rigid transform + Gaussian noise + (static-shape) dropout by
    resampling kept points, producing the 'source' cloud of a registration
    test pair. keep_fraction < 1 simulates partial overlap."""
    k_noise, k_keep = jax.random.split(key)
    out = pose.apply(points)
    if noise > 0:
        out = out + noise * jax.random.normal(k_noise, out.shape, dtype=out.dtype)
    if keep_fraction < 1.0:
        n = points.shape[0]
        n_keep = max(int(n * keep_fraction), 1)
        idx = jax.random.permutation(k_keep, n)[:n_keep]
        out = out[idx]
    return out
