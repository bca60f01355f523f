#!/usr/bin/env python
"""Kernel-level throughput matrix over the engine's hot shapes
(round-3 verdict item 4): K in {64, 512} x {unmasked, masked} fused
E+M sweeps, each against its shape-correct attainable roofline.

- K=512 unmasked: the headline bench.py shape (registration/fit at leaf
  resolution) — MXU-bound at the measured shape rates (RESULTS.md §1b).
- K=64 unmasked: BASELINE config 1 (flat K=64) — HBM-bound at this K
  (the 224 B/pt feature stream dominates), so the % measures stream
  efficiency, not MXU/VPU.
- masked: the tree-fit child-masked E-step (config 2's build workhorse,
  fused_em._em_stats_kernel parent path). The mask costs extra K x T VPU
  work (iota, //branch, ==, where ~ 4 passes on top of the softmax's 2),
  and the masked body is not sub-tiled; both attainables are printed.

Usage: python benchmarks/kernel_shapes.py   (real chip)
Results recorded in RESULTS.md §1c.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 21
BRANCH = 8


def sweeps_for(k: int) -> int:
    """Sweep-chain length per K, scaled so every row's timed chain is
    >= 10x the tunnel RTT (round-4 verdict weak item 6: at K=64 a
    30-sweep chain was ~17 ms against a ~25 ms RTT, so the subtraction
    noise exceeded the quantity measured and one row read >100%).
    K=64 ~0.65 ms/sweep x 600 = ~390 ms; K=512 ~2.15 ms x 200 = ~430 ms
    (first pass used 120 sweeps at K=512 = 294 ms, marginal against a
    30 ms RTT sample — hence the margin here)."""
    return max(200, 38400 // k)


def build_chain(k, masked):
    from hgmm.ops import fused_em
    from hgmm.ops.gaussians import MixtureParams, max_logit, pack_loglik_weights

    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(0), 5)
    mu = jax.random.normal(k1, (k, 3))
    a = 0.3 * jax.random.normal(k2, (k, 3, 3))
    sigma = jnp.einsum("kij,klj->kil", a, a) + 0.05 * jnp.eye(3)
    params = MixtureParams(jax.nn.softmax(jax.random.normal(k3, (k,))), mu, sigma)
    pts = jax.random.normal(k4, (N, 3), jnp.float32)
    W = pack_loglik_weights(params)
    shift = max_logit(W)
    phiw, phi48 = fused_em.prepare_phi(pts)
    wt = fused_em.prepare_mixture(W, shift=shift)
    sm = fused_em._softmax_scalars(None, shift)
    if masked:
        par = jax.random.randint(k5, (N,), 0, k // BRANCH, jnp.int32)
        par = jnp.pad(par, (0, phiw.shape[1] - N), constant_values=-1)[None, :]
    else:
        par = None

    sweeps = sweeps_for(k)

    @jax.jit
    def chain(phiw, phi48, wt, sm):
        def body(c, _):
            s, ll = fused_em._em_stats_call(
                phiw, phi48, wt, sm + 1e-38 * c, parent=par, branch=BRANCH
            )
            return c + jnp.sum(s) + ll, None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=sweeps)[0]

    return chain, (phiw, phi48, wt, sm)


def main():
    from hgmm.eval.roofline import estep_attainable
    from hgmm.utils.timing import measure_rtt

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rows = []
    for k in (64, 512):
        for masked in (False, True):
            sweeps = sweeps_for(k)
            chain, args = build_chain(k, masked)
            float(chain(*args))  # compile + warm
            rtt = measure_rtt()
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(chain(*args))
                times.append(time.perf_counter() - t0)
            total = float(np.median(times))
            if total < 10 * rtt:
                print(
                    f"  WARNING K={k}: timed chain {total*1e3:.0f} ms < 10x "
                    f"RTT {rtt*1e3:.0f} ms — lengthen sweeps_for({k})"
                )
            per_sweep = max(total - rtt, 1e-9) / sweeps
            pps = N / per_sweep
            att = estep_attainable(k)
            att_mask = estep_attainable(k, extra_vpu_passes=4.0)
            row = dict(
                k=k, masked=masked, ms=per_sweep * 1e3, gpts=pps / 1e9,
                pct=100 * pps / att.points_per_sec, bound=att.bound,
                pct_mask=100 * pps / att_mask.points_per_sec,
                bound_mask=att_mask.bound,
            )
            rows.append(row)
            label = f"K={k:4d} {'masked  ' if masked else 'unmasked'}"
            extra = (
                f"; masked-attainable ({att_mask.bound}) {row['pct_mask']:.1f}%"
                if masked else ""
            )
            print(
                f"{label}: {row['ms']:.3f} ms/sweep, {row['gpts']:.3f} Gpts/s "
                f"= {row['pct']:.1f}% of unmasked attainable ({att.bound})"
                f"{extra}"
            )
    return rows


if __name__ == "__main__":
    main()
