#!/usr/bin/env python
"""One-off probe: time the fused E+M sweep at a given HGMM_SUBTILE/tile.
Usage: HGMM_SUBTILE=c python benchmarks/_subtile_probe.py [--tile 4096]"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--sweeps", type=int, default=30)
    ap.add_argument("--n", type=int, default=1 << 21)
    args = ap.parse_args()

    from hgmm.ops import fused_em
    from hgmm.ops.gaussians import MixtureParams, max_logit, pack_loglik_weights

    K = 512
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    mu = jax.random.normal(k1, (K, 3))
    a = 0.3 * jax.random.normal(k2, (K, 3, 3))
    sigma = jnp.einsum("kij,klj->kil", a, a) + 0.05 * jnp.eye(3)
    params = MixtureParams(jax.nn.softmax(jax.random.normal(k3, (K,))), mu, sigma)
    pts = jax.random.normal(k4, (args.n, 3), jnp.float32)
    W = pack_loglik_weights(params)
    shift = max_logit(W)
    phiw, phi48 = fused_em.prepare_phi(pts)
    wt = fused_em.prepare_mixture(W, shift=shift)
    sm = fused_em._softmax_scalars(None, shift)

    @jax.jit
    def chain(phiw, phi48, wt, sm):
        def body(c, _):
            s, ll = fused_em._em_stats_call(
                phiw, phi48, wt, sm + 1e-38 * c, tile=args.tile
            )
            return c + jnp.sum(s) + ll, None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=args.sweeps)[0]

    float(chain(phiw, phi48, wt, sm))
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(chain(phiw, phi48, wt, sm))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / args.sweeps * 1e3
    print(
        f"subtile={fused_em._SUBTILE} tile={args.tile}: {ms:.3f} ms/sweep, "
        f"{args.n/(ms*1e-3)/1e9:.3f} Gpts/s"
    )


if __name__ == "__main__":
    main()
