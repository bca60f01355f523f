#!/usr/bin/env python
"""Headline benchmark: fused E-step+M-step sweep throughput on 1 TPU chip.

Prints ONE JSON line:
  {"metric": "estep_points_per_sec_chip", "value": N, "unit": "points/s",
   "vs_baseline": r}
where vs_baseline = measured / (0.70 * attainable-roofline points/s) — the
BASELINE.json:5 target is ">70% of per-chip matmul roofline", so
vs_baseline >= 1.0 means the target is met (see hgmm.eval.roofline for the
attainable model). Extra context goes to stderr.

Methodology: the sweep (tiled log-likelihood matmul + fused softmax + VMEM
suff-stat reduction, K=512 leaf mixture — the hierarchical-GMM workhorse
shape) is chained SWEEPS times inside one jit so the axon-tunnel dispatch
RTT amortizes; the residual RTT (measured via a null jitted call, ~10-25 ms
on this tunnel) is subtracted so the metric is DEVICE time — raw wall time
is logged to stderr alongside for transparency.
"""

import argparse
import contextlib
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 21
K = 512
# 150 sweeps x ~2.1 ms = ~320 ms timed chain, >=12x the ~25 ms tunnel RTT
# (50 sweeps was ~4x — the RTT subtraction left +-3% run-to-run noise on
# the driver-recorded number; same fix as benchmarks/kernel_shapes.py
# sweeps_for).
SWEEPS = 150


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--trace", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the timed sweeps to DIR "
        "(TensorBoard/Perfetto; SURVEY.md §6.1)",
    )
    args = ap.parse_args()
    run_bench(trace_dir=args.trace)


def run_bench(trace_dir=None) -> None:
    from hgmm.eval.roofline import estep_attainable
    from hgmm.ops import fused_em
    from hgmm.ops.gaussians import MixtureParams, max_logit, pack_loglik_weights

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    mu = jax.random.normal(k1, (K, 3))
    a = 0.3 * jax.random.normal(k2, (K, 3, 3))
    sigma = jnp.einsum("kij,klj->kil", a, a) + 0.05 * jnp.eye(3)
    params = MixtureParams(jax.nn.softmax(jax.random.normal(k3, (K,))), mu, sigma)
    pts = jax.random.normal(k4, (N, 3), jnp.float32)

    W = pack_loglik_weights(params)
    shift = max_logit(W)
    phiw, phi48 = fused_em.prepare_phi(pts)
    wt = fused_em.prepare_mixture(W, shift=shift)
    sm = fused_em._softmax_scalars(None, shift)

    use_pallas = backend == "tpu"

    @jax.jit
    def sweep_chain(phiw, phi48, wt, sm):
        def body(c, _):
            # Thread the carry into an input so XLA cannot hoist the
            # loop-invariant kernel out of the scan (1e-38*c is exactly 0 in
            # every run but data-dependent to the compiler).
            s, ll = fused_em._em_stats_call(phiw, phi48, wt, sm + 1e-38 * c)
            return c + jnp.sum(s) + ll, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=SWEEPS)
        return c

    if not use_pallas:
        log("WARNING: no TPU backend; benchmarking dense XLA twin on CPU")

    # Warmup (compile) + timed runs with forced host sync.
    from hgmm.utils.timing import measure_rtt

    for _ in range(2):
        float(sweep_chain(phiw, phi48, wt, sm))
    rtt = measure_rtt()
    if trace_dir is not None:
        from hgmm.utils.profiling import trace

        trace_ctx = trace(trace_dir)
        log(f"profiler trace -> {trace_dir}")
    else:
        trace_ctx = contextlib.nullcontext()
    times = []
    with trace_ctx:
        for _ in range(5):
            t0 = time.perf_counter()
            float(sweep_chain(phiw, phi48, wt, sm))
            times.append(time.perf_counter() - t0)
    raw_per_sweep = float(np.median(times)) / SWEEPS
    per_sweep = max(float(np.median(times)) - rtt, 1e-9) / SWEEPS
    log(
        f"raw {raw_per_sweep*1e3:.3f} ms/sweep incl. {rtt*1e3:.1f} ms "
        f"tunnel rtt over {SWEEPS} sweeps"
    )
    pps = N / per_sweep

    att = estep_attainable(K)
    target = 0.70 * att.points_per_sec
    flops = att.flops_per_point * pps
    log(
        f"K={K} N={N}: {per_sweep*1e3:.3f} ms/sweep, {pps/1e9:.3f} Gpts/s, "
        f"{flops/1e12:.1f} TFLOP/s executed; attainable {att.points_per_sec/1e9:.3f} "
        f"Gpts/s ({att.bound}-bound) -> {100*pps/att.points_per_sec:.1f}% of roofline "
        f"(no-overlap lower bound {att.serial_points_per_sec/1e9:.3f} Gpts/s -> "
        f"{100*pps/att.serial_points_per_sec:.1f}%)"
    )
    print(
        json.dumps(
            {
                "metric": "estep_points_per_sec_chip",
                "value": round(pps),
                "unit": "points/s",
                "vs_baseline": round(pps / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
