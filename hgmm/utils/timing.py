"""Benchmark timing harness (SURVEY.md §6.1): compiled-call wall timing with
block_until_ready, replacing the reference's cudaEvent timers."""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def sync(out) -> None:
    """Force completion of every device computation `out` depends on.

    `jax.block_until_ready` alone is NOT sufficient on this environment's
    axon TPU-tunnel backend: it returns immediately (~0.2 ms) while the
    dispatched program is still executing remotely (measured: a 26 s ICP
    call "blocked" in 0.2 ms, so warmup never synced and timed iterations
    measured only dispatch). A host-side scalar read is the only reliable
    barrier, so we pull one element of every array leaf to the host.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(out) if isinstance(x, jax.Array)]
    if not leaves:
        return
    jax.block_until_ready(leaves)
    # One fused dispatch + one scalar transfer (~1 tunnel RTT total).
    float(_first_sum(leaves))


@jax.jit
def _first_sum(leaves):
    acc = jnp.zeros((), jnp.float32)
    for x in leaves:
        acc = acc + jnp.ravel(x)[0].astype(jnp.float32)
    return acc


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 10,
    **kwargs,
):
    """Median wall-time of fn(*args) with device sync (the first warmup call
    pays the compile). Returns (out, median_s, all_times)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync(out)
        times.append(time.perf_counter() - t0)
    return out, float(np.median(times)), times


def measure_rtt(iters: int = 7) -> float:
    """Median dispatch+sync round-trip of a null jitted call (seconds).

    On the axon TPU tunnel this is ~10-25 ms per call; benchmarks that
    time short compiled calls subtract it so they report device time, not
    tunnel latency. The MEDIAN over 7 samples is the unbiased correction
    for a median-of-calls measurement (each timed call embeds one draw
    from the RTT distribution); regression GUARDS that must never flatter
    the kernel use the minimum instead (test_tpu_smoke.py)."""
    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(jnp.sum)
    float(f(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
