"""Tracing/profiling helpers (SURVEY.md §6.1): jax.profiler traces
(TensorBoard/Perfetto) + structured per-iteration metric records, replacing
the reference's ad-hoc cudaEvent timing."""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/hgmm_trace"):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    """Append-only JSONL metrics sink (SURVEY.md §6.5). Registration /
    odometry pipelines return scan-carried metric arrays; this serializes
    them with wall-clock context."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, record: dict) -> None:
        record = {"time": time.time(), **_to_jsonable(record)}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def log_registration(self, name: str, result) -> None:
        self.log(
            {
                "event": "registration",
                "name": name,
                "logliks": result.logliks,
                "deltas": result.deltas,
                "converged": result.converged,
            }
        )


def _to_jsonable(x):
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if hasattr(x, "shape"):
        arr = np.asarray(x)
        return arr.item() if arr.ndim == 0 else arr.tolist()
    return x
