#!/usr/bin/env python
"""Attribute the headline sweep time from a profiler trace (round-4
verdict item 3: "account for the kernel's missing ~17%").

Parses the Perfetto trace.json.gz written by `python bench.py --trace DIR`
(hgmm.utils.profiling.trace) and decomposes the per-sweep device time:

  kernel        per-sweep duration of the Pallas kernel's device event
                (the `closed_call` op XLA wraps a pallas_call in)
  fusions       the scan-carry XLA fusions (broadcast_add / add_reduce)
  gap           while-loop time not covered by any child event
                (grid scheduling, DMA not overlapped by compute, etc.)

and compares against the roofline model's per-unit work
(hgmm.eval.roofline): MXU busy time at measured shape rates is a lower
bound on kernel time, so `kernel - mxu_busy` is the VPU/DMA work Mosaic
failed to hide under the MXU. Result (2026-08-21 chip trace, committed in
RESULTS.md §1d): gap + fusions ~ 0.001 ms/sweep — the entire deficit vs
the attainable bound is INTRA-kernel exposed VPU work, not grid/dispatch
overhead.

Usage: python benchmarks/trace_accounting.py /tmp/trace_r5 [--k 512] [--n 2097152]
The sweep count is derived from the trace itself (one kernel event per
sweep inside the analyzed while-window), so traces captured with any
bench.py SWEEPS value attribute correctly.
"""

import argparse
import collections
import gzip
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_device_events(trace_dir: Path):
    files = sorted(trace_dir.rglob("*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    return [
        e for e in events if e.get("ph") == "X" and e.get("pid") in device_pids
    ]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--n", type=int, default=1 << 21)

    args = ap.parse_args()

    ev = load_device_events(args.trace_dir)
    by = collections.defaultdict(list)
    for e in ev:
        by[e["name"]].append(e)
    whiles = by.get("while", [])
    kernels = [
        name for name in by if name.startswith("closed_call")
    ]  # pallas_call lowers to a closed_call op
    if not whiles or not kernels:
        raise SystemExit(
            f"trace has no while/closed_call device events: {sorted(by)}"
        )
    kname = max(kernels, key=lambda n: sum(e["dur"] for e in by[n]))
    w = sorted(whiles, key=lambda e: -e["dur"])[len(whiles) // 2]
    t0, t1 = w["ts"], w["ts"] + w["dur"]
    kids = [
        e
        for e in ev
        if e["name"] != "while"
        and not e["name"].startswith("jit_")
        and t0 <= e["ts"] and e["ts"] + e["dur"] <= t1
    ]
    kern = [e for e in kids if e["name"] == kname]
    # One kernel event per sweep in the window: divide the fusion/gap
    # totals by the OBSERVED count, not an assumed bench.py chain length
    # (a round-4 trace at SWEEPS=50 analyzed with an assumed 150 would
    # under-report both 3x).
    sweeps = max(len(kern), 1)
    per_sweep_kernel = sum(e["dur"] for e in kern) / sweeps
    fus = sum(e["dur"] for e in kids if e["name"] != kname) / sweeps
    gap = (w["dur"] - sum(e["dur"] for e in kids)) / sweeps

    from hgmm.eval.roofline import (
        MXU_LOGITS_RATE,
        MXU_STATS_RATE,
        VPU_EXP2_CAST_PAIR_PS,
        VPU_SUM_PASS_PS,
        estep_attainable,
    )

    k, n = args.k, args.n
    ms = 1e-3  # trace durations are in microseconds
    t_logits = 2.0 * k * 80.0 / MXU_LOGITS_RATE * n * 1e3
    t_stats = 2.0 * k * 32.0 / MXU_STATS_RATE * n * 1e3
    t_mxu = t_logits + t_stats
    t_vpu = k * (VPU_EXP2_CAST_PAIR_PS + VPU_SUM_PASS_PS) * n * 1e3
    att = estep_attainable(k)
    rows = [
        ("kernel (closed_call, trace)", per_sweep_kernel * ms, len(kern)),
        ("scan-carry fusions (trace)", fus * ms, None),
        ("while gap: grid/DMA not in any event (trace)", gap * ms, None),
        ("MXU busy floor: logits matmul (model)", t_logits, None),
        ("MXU busy floor: stats matmul (model)", t_stats, None),
        ("VPU work total: exp2+cast+norm-sum (model)", t_vpu, None),
        ("=> exposed VPU (kernel - MXU busy)", per_sweep_kernel * ms - t_mxu, None),
        ("=> VPU hidden under MXU", t_vpu - (per_sweep_kernel * ms - t_mxu), None),
    ]
    print(f"sweep decomposition, K={k} N={n} ({kname}):")
    for name, v, cnt in rows:
        extra = f"  (x{cnt} in window)" if cnt else ""
        print(f"  {name:48s} {v:8.3f} ms{extra}")
    total = (per_sweep_kernel + fus + gap) * ms
    print(
        f"  per-sweep device total {total:.3f} ms = "
        f"{n / (total * 1e-3) / 1e6:.0f} Mpts/s = "
        f"{100 * n / (total * 1e-3) / att.points_per_sec:.1f}% of attainable "
        f"({att.bound}-bound {att.points_per_sec / 1e9:.3f} Gpts/s); "
        f"MXU occupancy {100 * t_mxu / (per_sweep_kernel * ms):.1f}%, "
        f"VPU overlap "
        f"{100 * (t_vpu - (per_sweep_kernel * ms - t_mxu)) / t_vpu:.1f}%"
    )


if __name__ == "__main__":
    main()
