#!/usr/bin/env python
"""Standalone VPU lane-rate microbenchmark (round-3 verdict item 3).

Pins the roofline's VPU_LANE_OPS constant (hgmm/eval/roofline.py)
INDEPENDENTLY of the fused E-step kernel, de-circularizing the headline
"% of attainable roofline": previously the constant was derived from the
fused kernel's own non-MXU time, so an inefficient kernel would understate
the bound and flatter itself.

Method: two Pallas kernels over one VMEM-resident [K, T] f32 tile (no
matmuls, no HBM streaming — a single block reused across a long sequential
grid; each grid step reads the carried output block, so Mosaic cannot
elide the chain):

  exp2-mode iteration:  x <- -(float32(bfloat16(exp2(x))))
      = the roofline's pair (exp2 pass + f32->bf16 downcast) PLUS a
        bf16->f32 upcast and a negate (chain glue; values converge to the
        fixed point x* = -exp2(x*) ~ -0.7666, so no over/underflow).
  cast-mode iteration:  x <- -(float32(bfloat16(x)))
      = the same chain glue WITHOUT the exp2 (isolates the glue cost).

Each mode is timed at reps=R1 and reps=R2 iterations per grid step;
differencing (t_R2 - t_R1)/(R2 - R1) cancels per-step overheads AND the
axon-tunnel dispatch RTT exactly. The roofline pair cost is then

  tau_pair = tau_iter(exp2) - (2/3) * tau_iter(cast)

attributing 2 of the cast-iteration's ~3 lane-ops (upcast, negate) to
glue — the only modeling assumption left, and it is about plain move ops,
not the transcendental. Reported VPU_LANE_OPS = 2 / tau_pair (lane-ops/s
at 1 op per element per pass).

Run on the real chip:  python benchmarks/vpu_microbench.py
Results recorded in RESULTS.md §1b and cited by hgmm/eval/roofline.py.
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, *, reps, mode):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = x_ref[:]

    x = o_ref[:]
    for _ in range(reps):
        if mode == "exp2":
            x = -(jax.lax.exp2(x).astype(jnp.bfloat16).astype(jnp.float32))
        else:
            x = -(x.astype(jnp.bfloat16).astype(jnp.float32))
    o_ref[:] = x


def build(k, t, steps, reps, mode):
    f = pl.pallas_call(
        partial(_kernel, reps=reps, mode=mode),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((k, t), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((k, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, t), jnp.float32),
    )
    return jax.jit(f)


def time_call(f, x, iters=5):
    float(jnp.sum(f(x)))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--r1", type=int, default=4)
    ap.add_argument("--r2", type=int, default=8)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    k, t, steps = args.k, args.t, args.steps
    elems = k * t * steps
    x = -1.5 + jax.random.uniform(jax.random.PRNGKey(0), (k, t), jnp.float32)

    tau = {}
    for mode in ("exp2", "cast"):
        t1 = time_call(build(k, t, steps, args.r1, mode), x)
        t2 = time_call(build(k, t, steps, args.r2, mode), x)
        tau[mode] = (t2 - t1) / ((args.r2 - args.r1) * elems)
        print(
            f"{mode:>5}: reps {args.r1}->{args.r2}: {t1*1e3:.1f} -> "
            f"{t2*1e3:.1f} ms, tau_iter = {tau[mode]*1e12:.4f} ps/elem "
            f"({1/tau[mode]/1e12:.3f} Telem/s)"
        )
    tau_pair = tau["exp2"] - (2.0 / 3.0) * tau["cast"]
    rate = 2.0 / tau_pair
    print(
        f"roofline pair (exp2 + bf16 downcast): tau = {tau_pair*1e12:.4f} "
        f"ps/elem -> VPU_LANE_OPS = {rate:.4g} lane-ops/s"
    )
    print(
        f"sanity: exp2-iter as 4 lane-ops -> {4/tau['exp2']:.4g} ops/s; "
        f"cast-iter as 3 lane-ops -> {3/tau['cast']:.4g} ops/s "
        f"(agreement validates ~1 op/cycle attribution)"
    )


if __name__ == "__main__":
    main()
