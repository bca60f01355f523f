#!/usr/bin/env python
"""Ablate the fused E-step fast-path variants on the real chip in ONE
process (each remote compile costs minutes here, so a fresh process per
variant would pay it thrice anyway — but a single process also keeps the
comparison apples-to-apples).

Variants (fused_em module header):
  0: exp2 f32 + explicit e->bf16 cast (2 K x T VPU passes)  [shipped]
  1: exp2 f32, e stays f32; the MXU ingests/rounds it        (1 pass?)
  2: exp2 on bf16 d                                          (1 cheap pass,
     bf16-rounded logits — accuracy measured separately on CPU)

Cache-bust note: this environment's remote-compile service keys executables
on the OUTER jit signature, not HLO, so each variant runs at a slightly
different N (one tile less) to force a distinct executable. Throughput is
reported per point, so the comparison is unaffected.

Usage: python benchmarks/ablate_variants.py [--sweeps 30]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

K = 512
TILE = 4096
BASE_N = 1 << 21


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=30)
    ap.add_argument("--variants", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--n", type=int, default=BASE_N, help="base point count")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    base_n = args.n

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hgmm.ops import fused_em
    from hgmm.ops.gaussians import MixtureParams, max_logit, pack_loglik_weights

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    mu = jax.random.normal(k1, (K, 3))
    a = 0.3 * jax.random.normal(k2, (K, 3, 3))
    sigma = jnp.einsum("kij,klj->kil", a, a) + 0.05 * jnp.eye(3)
    params = MixtureParams(jax.nn.softmax(jax.random.normal(k3, (K,))), mu, sigma)
    W = pack_loglik_weights(params)
    shift = max_logit(W)
    pts_all = jax.random.normal(k4, (base_n, 3), jnp.float32)

    for vi, variant in enumerate(args.variants):
        fused_em._FAST_VARIANT = variant
        n = base_n - vi * TILE  # distinct executable per variant (see above)
        assert n >= TILE, "use --variants to subset at small --n"
        phiw, phi48 = fused_em.prepare_phi(pts_all[:n])
        wt = fused_em.prepare_mixture(W, shift=shift)
        sm = fused_em._softmax_scalars(None, shift)

        def chain(phiw, phi48, wt, sm, sweeps=args.sweeps):
            def body(c, _):
                s, ll = fused_em._em_stats_call(phiw, phi48, wt, sm + 1e-38 * c)
                return c + jnp.sum(s) + ll, None

            return jax.lax.scan(body, jnp.float32(0.0), None, length=sweeps)[0]

        jitted = jax.jit(chain)
        t0 = time.perf_counter()
        float(jitted(phiw, phi48, wt, sm))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jitted(phiw, phi48, wt, sm))
            times.append(time.perf_counter() - t0)
        per_sweep = float(np.median(times)) / args.sweeps
        print(
            json.dumps(
                {
                    "variant": variant,
                    "n": n,
                    "ms_per_sweep": round(per_sweep * 1e3, 4),
                    "ns_per_point": round(per_sweep / n * 1e9, 4),
                    "gpts_per_sec": round(n / per_sweep / 1e9, 4),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
