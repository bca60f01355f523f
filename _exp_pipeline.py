"""Scratch experiment: intra-tile software pipelining of the fused EM kernel.

Hypothesis: the serial chain logits(MXU) -> softmax(VPU) -> stats(MXU) leaves
each unit idle ~40% of the time; splitting the tile into C chunks and
interleaving exposes ILP the Mosaic scheduler can overlap.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hgmm.ops import em_ref, fused_em
from hgmm.ops.fused_em import (
    _logits_of,
    _phi_of,
    _softmax_cols_raw,
    _stats_dot_t,
)
from hgmm.ops.gaussians import MixtureParams, pack_loglik_weights

N = 1 << 21
K = 512
SWEEPS = 50
_F32 = jnp.float32
_BF16 = jnp.bfloat16


def make_inputs():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    mu = jax.random.normal(k1, (K, 3))
    a = 0.3 * jax.random.normal(k2, (K, 3, 3))
    sigma = jnp.einsum("kij,klj->kil", a, a) + 0.05 * jnp.eye(3)
    params = MixtureParams(jax.nn.softmax(jax.random.normal(k3, (K,))), mu, sigma)
    pts = jax.random.normal(k4, (N, 3), jnp.float32)
    W = pack_loglik_weights(params)
    return pts, W


def _kernel_chunked(pts_ref, wt_ref, outlier_ref, out_s_ref, out_ll_ref, *, chunks):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_s_ref[:] = jnp.zeros_like(out_s_ref)
        out_ll_ref[0, 0] = 0.0

    pts = pts_ref[:]
    t = pts.shape[1]
    c = t // chunks
    fast = wt_ref.dtype == _BF16
    wt = wt_ref[:]
    out = outlier_ref[0, 0]

    # Stage 1: all logits matmuls up front (MXU), phis kept.
    phis, ws, logits = [], [], []
    for i in range(chunks):
        sl = pl.ds(i * c, c)
        x, y, z, w = pts[0:1, sl], pts[1:2, sl], pts[2:3, sl], pts[3:4, sl]
        phi = _phi_of(x, y, z)
        phis.append(phi)
        ws.append(w)
        logits.append(_logits_of(wt, phi))

    # Stage 2: softmax (VPU) of chunk i interleaved with stats matmul (MXU)
    # of chunk i-1 — the scheduler sees independent chains.
    s_acc = None
    ll = None
    for i in range(chunks):
        e, scale, lse = _softmax_cols_raw(logits[i], ws[i], out)
        s_tile = _stats_dot_t(e, phis[i] * scale, fast=fast)
        s_acc = s_tile if s_acc is None else s_acc + s_tile
        ll = jnp.sum(lse) if ll is None else ll + jnp.sum(lse)
    out_s_ref[:] = out_s_ref[:] + s_acc
    out_ll_ref[0, 0] += ll


def call_chunked(pts_t, wt, outlier, tile, chunks):
    n_pad = pts_t.shape[1]
    k_pad, w_lanes = wt.shape
    grid = (n_pad // tile,)
    s_rows = 32 if wt.dtype == _BF16 else 16
    s_out, ll_out = pl.pallas_call(
        functools.partial(_kernel_chunked, chunks=chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, w_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((s_rows, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_rows, k_pad), _F32),
            jax.ShapeDtypeStruct((1, 1), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * k_pad * 16 * n_pad * 2 + 8 * k_pad * n_pad,
            bytes_accessed=n_pad * 36 + k_pad * 64 * 2,
            transcendentals=(k_pad + 2) * n_pad,
        ),
    )(pts_t, wt, outlier)
    if s_rows == 32:
        s_out = s_out[0:16] + s_out[16:32]
    return s_out.T, ll_out[0, 0]


def timeit(fn, *args):
    @jax.jit
    def chain(*a):
        def body(carry, _):
            s, ll = fn(*a[:-1], a[-1] + 1e-38 * carry)
            return carry + jnp.sum(s) + ll, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=SWEEPS)
        return c

    for _ in range(2):
        float(chain(*args))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(*args))
        times.append(time.perf_counter() - t0)
    per = float(np.median(times)) / SWEEPS
    return per, N / per


def main():
    pts, W = make_inputs()
    outlier = jnp.full((1, 1), em_ref.NEG_INF, jnp.float32)

    wt4096 = fused_em.prepare_mixture(W)
    for tile in (4096, 8192, 16384):
        pts_t = fused_em.prepare_points(pts, tile=tile)
        if tile == 4096:
            per, pps = timeit(
                lambda p, w, o: fused_em._em_stats_call(p, w, o, tile=tile),
                pts_t, wt4096, outlier,
            )
            print(f"baseline  tile={tile}: {per*1e3:.3f} ms/sweep {pps/1e9:.3f} Gpts/s")
        for chunks in (2, 4):
            if tile // chunks < 512:
                continue
            try:
                per, pps = timeit(
                    lambda p, w, o, t=tile, c=chunks: call_chunked(p, w, o, t, c),
                    pts_t, wt4096, outlier,
                )
                print(
                    f"chunked   tile={tile} c={chunks}: {per*1e3:.3f} ms/sweep "
                    f"{pps/1e9:.3f} Gpts/s"
                )
            except Exception as ex:
                print(f"chunked tile={tile} c={chunks} FAILED: {type(ex).__name__}: {str(ex)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
