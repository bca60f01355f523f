#!/usr/bin/env python
"""Weak-scaling benchmark of sharded EM (BASELINE.md row 2: ">= 80%
weak-scaling efficiency at N>=2 hosts").

Runs the REAL sharded program (Mesh + shard_map + psum) on subsets of the
available devices with a fixed per-device point count and reports
points/sec + efficiency vs 1 device. On the CI container the devices are 8
fake CPU devices (functional validation of the scaling path); on a pod
slice the same script measures real ICI scaling — run under
`jax.distributed.initialize` for multi-host.

Usage: python benchmarks/scaling.py [--points-per-device 262144] [--cpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points-per-device", type=int, default=1 << 18)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true", help="force CPU fake devices")
    args = ap.parse_args()

    import os

    if args.cpu and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hgmm.data.synthetic import make_cloud
    from hgmm.models.gmm import init_params
    from hgmm.parallel import make_mesh, sharded_em_fit

    devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= len(devices)]
    print(f"# backend={jax.default_backend()} devices={len(devices)}", file=sys.stderr)

    # Sharded-program overhead at 1 device: unsharded em_fit vs the same
    # fit through Mesh+shard_map+psum on a 1-device mesh. This is the part
    # of the weak-scaling story measurable on a single chip (the collective
    # machinery must be ~free before multi-host efficiency can be >=80%).
    from hgmm.models.gmm import em_fit
    from hgmm.utils.timing import measure_rtt

    rtt = measure_rtt()
    print(f"# null-call rtt {rtt*1e3:.1f} ms (subtracted)", file=sys.stderr)

    n1 = args.points_per_device
    pts1 = make_cloud(jax.random.PRNGKey(0), n1, kind="trefoil")
    init1 = init_params(pts1, args.k, jax.random.PRNGKey(1))

    def run_unsharded():
        p, _ = em_fit(pts1, init1, n_iters=args.iters)
        float(p.mu[0, 0])

    run_unsharded()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_unsharded()
        times.append(time.perf_counter() - t0)
    unsharded_pps = n1 / (max(float(np.median(times)) - rtt, 1e-9) / args.iters)

    results = []
    base_pps = None
    for s in sizes:
        mesh = make_mesh(devices[:s])
        n = args.points_per_device * s
        pts = make_cloud(jax.random.PRNGKey(0), n, kind="trefoil")
        init = init_params(pts, args.k, jax.random.PRNGKey(1))
        # compile + warm
        p, _ = sharded_em_fit(pts, init, mesh, n_iters=args.iters)
        float(p.mu[0, 0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            p, _ = sharded_em_fit(pts, init, mesh, n_iters=args.iters)
            float(p.mu[0, 0])
            times.append(time.perf_counter() - t0)
        dt = max(float(np.median(times)) - rtt, 1e-9) / args.iters
        pps = n / dt
        if base_pps is None:
            base_pps = pps / s  # per-device at s=1
        eff = pps / (base_pps * s)
        rec = {"devices": s, "points": n, "points_per_sec": round(pps),
               "weak_scaling_efficiency": round(eff, 4)}
        if s == 1:
            rec["unsharded_points_per_sec"] = round(unsharded_pps)
            rec["sharding_overhead"] = round(1.0 - pps / unsharded_pps, 4)
        if jax.default_backend() == "cpu":
            # Fake devices share one physical CPU: this validates the
            # sharded program, the efficiency number is meaningless here.
            rec["note"] = "fake shared-CPU devices; functional validation only"
        results.append(rec)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
