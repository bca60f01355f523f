#!/usr/bin/env python
"""MXU shape-rate microbenchmark (round-4; companion of vpu_microbench.py).

The vpu_microbench showed the v5e VPU retires the fused kernel's exp2+cast
pair ~2.9x faster than the round-3 roofline assumed, which means the K=512
E-step is NOT VPU-bound — the binding ceiling is the MXU at the kernel's
ACTUAL matmul shapes, which cannot reach datasheet peak:

  logits:  [K, 80] bf16 @ [80, T] bf16 -> f32   (contraction 80 < 128:
           the 128-deep systolic array runs >=48 dead rows)
  stats:   [32, T] bf16 @ [T, K]^T -> f32 [32, K] (8-sublane output
           streaming granularity on a 32-row output)
  norm:    [8, K] @ [K, T] -> [8, T] ones-row sum

This benchmark times each shape ALONE inside a Pallas kernel (inputs
VMEM-resident, long sequential grid, rep-count differencing to cancel
per-step overhead and tunnel RTT — same method as vpu_microbench) and
reports the EFFECTIVE flops/s per shape. hgmm/eval/roofline.py cites these
as the shape-aware MXU rates of its attainable model: a denominator built
from datasheet peak (197 TFLOP/s) on executed flops is not attainable BY
ANY implementation of this strategy, because the shapes are fixed by the
algorithm's 16-feature formulation.

Anti-DCE: every rep's FULL matmul output is accumulated into the output
ref (slicing the output lets XLA shrink the matmul itself — measured: a
[:, :128] slice made extra logits reps literally free). The accumulation
add contaminates each rep with one f32 elementwise pass over the output;
an add-only case measures that pass and the report subtracts it.

Run on the real chip: python benchmarks/mxu_microbench.py
Results in RESULTS.md §1b; cited by hgmm/eval/roofline.py.
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

K = 512
T = 2048  # rate-representative: contraction/output shapes match the
# kernel; T only amortizes setup. (T=8192 f32 output blocks exceed the
# 16 MB scoped-VMEM limit when accumulated as anti-DCE outputs.)


def _logits_kernel(wt_ref, phi_ref, o_ref, *, reps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = o_ref[:]
    wt = wt_ref[:]
    for r in range(reps):
        d = jnp.dot(
            wt + jnp.bfloat16(1e-6 * (r + 1)), phi_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [K, T] f32
        acc = acc + d  # full consumption — see module docstring
    o_ref[:] = acc


def _addonly_kernel(x_ref, o_ref, *, reps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = x_ref[:]

    acc = o_ref[:]
    for r in range(reps):
        acc = acc + (x_ref[:] + jnp.float32(1e-6 * (r + 1)))
    o_ref[:] = acc


def _stats_kernel(phi32_ref, e_ref, o_ref, *, reps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    dims = (((1,), (1,)), ((), ()))
    acc = o_ref[:]
    e = e_ref[:]
    for r in range(reps):
        s = jax.lax.dot_general(
            phi32_ref[:] + jnp.bfloat16(1e-6 * (r + 1)), e, dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [32, K]
        acc = acc + s
    o_ref[:] = acc


def _norm_kernel(ones_ref, e_ref, o_ref, *, reps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = o_ref[:]
    e = e_ref[:]
    for r in range(reps):
        s = jnp.dot(
            ones_ref[:] + jnp.bfloat16(1e-6 * (r + 1)), e,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [8, T]
        acc = acc + s
    o_ref[:] = acc


def build(kernel, shapes_in, dtypes_in, out_shape, steps, reps):
    f = pl.pallas_call(
        partial(kernel, reps=reps),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(s, lambda i, _s=s: (0,) * len(_s), memory_space=pltpu.VMEM)
            for s in shapes_in
        ],
        out_specs=pl.BlockSpec(
            out_shape, lambda i: (0,) * len(out_shape), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )
    return jax.jit(f)


def time_call(f, args, iters=5):
    float(jnp.sum(f(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1024)
    ap.add_argument("--r1", type=int, default=2)
    ap.add_argument("--r2", type=int, default=6)
    ap.add_argument(
        "--k", type=int, default=None,
        help="component count of the measured shapes (round-5: K=64 rates "
        "for the small-K roofline after the slim-stream kernel made that "
        "regime MXU-bound)",
    )
    ap.add_argument(
        "--t", type=int, default=None,
        help="tile width (small-K shapes need T=8192+ so the per-rep work "
        "dominates the rep-differencing noise; K=512 keeps 2048 to fit "
        "the anti-DCE f32 output under scoped VMEM)",
    )
    args = ap.parse_args()
    global K, T
    if args.k is not None:
        K = args.k
    if args.t is not None:
        T = args.t
    print(f"backend={jax.default_backend()} devices={jax.devices()} K={K} T={T}")

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    wt = jax.random.normal(k1, (K, 80), jnp.float32).astype(jnp.bfloat16)
    phi = jax.random.normal(k2, (80, T), jnp.float32).astype(jnp.bfloat16)
    e = jax.random.uniform(k3, (K, T), jnp.float32).astype(jnp.bfloat16)
    xf32 = jax.random.normal(k3, (K, T), jnp.float32)
    phi32 = phi[:32]
    ones8 = jnp.ones((8, K), jnp.bfloat16)

    def run_case(kern, shapes, arrs, out_shape):
        t1 = time_call(build(kern, shapes, None, out_shape, args.steps, args.r1), arrs)
        t2 = time_call(build(kern, shapes, None, out_shape, args.steps, args.r2), arrs)
        return (t2 - t1) / ((args.r2 - args.r1) * args.steps)  # s per rep-tile

    # f32 add pass over [K, T]: the accumulation contamination to subtract
    # (the add-only rep is two adds over K*T).
    t_add2 = run_case(_addonly_kernel, [(K, T)], (xf32,), (K, T))
    add_ps = t_add2 / 2.0 / (K * T)
    print(f"f32 add pass: {add_ps*1e12:.4f} ps/elem ({1/add_ps/1e12:.2f} Telem/s)")

    cases = {
        "logits": (_logits_kernel, [(K, 80), (80, T)], (wt, phi), (K, T),
                   2.0 * K * 80 * T, K * T),
        "stats": (_stats_kernel, [(32, T), (K, T)], (phi32, e), (32, K),
                  2.0 * 32 * K * T, 32 * K),
        "norm": (_norm_kernel, [(8, K), (K, T)], (ones8, e), (8, T),
                 2.0 * 8 * K * T, 8 * T),
    }
    total_per_pt = 0.0
    for name, (kern, shapes, arrs, out_shape, flops, out_elems) in cases.items():
        per_tile = run_case(kern, shapes, arrs, out_shape)
        per_tile_corr = per_tile - add_ps * out_elems
        rate = flops / per_tile_corr
        t_per_pt = per_tile_corr / T
        total_per_pt += t_per_pt
        print(
            f"{name:>6}: {per_tile*1e6:8.2f} us/tile raw, "
            f"{per_tile_corr*1e6:8.2f} add-corrected -> {rate/1e12:6.1f} "
            f"TFLOP/s effective ({100*rate/197e12:4.1f}% of bf16 peak), "
            f"{t_per_pt*1e12:.3f} ps/pt"
        )
    print(
        f"serial MXU total {total_per_pt*1e12:.3f} ps/pt -> "
        f"{1e-9/total_per_pt:.3f} Gpts/s MXU-only ceiling at K={K}"
    )


if __name__ == "__main__":
    main()
