"""Roofline model for the fused E-step kernel (BASELINE.md row 1).

Models the SHIPPED fast path (hgmm.ops.fused_em, precision="fast",
HGMM_FAST_VARIANT=0) honestly: EXECUTED work on each hardware unit at that
unit's sustainable rate, combined as an extended (multi-ceiling) roofline.

Per point, per EM sweep with K components (PHI = 16 features):

  MXU (bf16 multiplies, f32 accumulate) — executed FLOPs:
    logits matmul : 2 * K * 80   ([K,80] split weights @ [80,T] split phi)
    stats matmul  : 2 * 32 * K   ([32,T] hi/lo phi @ [K,T] e)
    normalizer    : 2 * 8 * K    (ones-row sum of e on the MXU)
  VPU — K x T elementwise passes:
    exp2(d)       : 1 pass       (the only transcendental)
    e -> bf16     : 1 pass       (explicit cast feeding the MXU)
    (the global-shift softmax eliminated the max, subtract and scale
    passes of a classic softmax — see fused_em._softmax_fast)
  HBM stream: 64 B/pt (phiw f32) + 160 B/pt (phi80 bf16) = 224 B/pt.

ATTAINABLE (the headline denominator, `points_per_sec`) is the
perfect-overlap bound

    t_point = max(t_hbm, t_mxu, t_vpu)

— no implementation of this strategy on this hardware can beat it, because
each unit must retire its executed work at its peak rate. This replaces the
round-2 serial model max(t_hbm, t_mxu + t_vpu): that model assumed Mosaic
never overlaps MXU and VPU work across grid steps, and measurement now
REFUTES it (the global-shift kernel sustains ~114% of the serial bound on
v5e — Mosaic does partially software-pipeline the exp2 of one grid step
under the matmuls of the next). A "roofline" a real run can exceed is not a
roofline; the serial figure is kept as `serial_points_per_sec`, a LOWER
bound on attainable, for context only.

Rates (TPU v5e, public specs + one measured constant):
  bf16 MXU peak 197 TFLOP/s; HBM 819 GB/s.
  VPU: 8x128 lanes x 8 sublanes ~0.94 GHz ~= 0.96e12 lane-ops/s; exp2 and
  f32->bf16 each retire ~1 lane-op/cycle (measured: the K=512 sweep's
  non-MXU time / (2K) lane-ops/pt ~= 1.0e12/s, consistent across tile
  sizes and K — see bench.py).
"""

from __future__ import annotations

import dataclasses

PHI = 16

# TPU v5e (1 chip): public specs.
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES = 819e9
# VPU elementwise/transcendental lane throughput (see module docstring).
VPU_LANE_OPS = 0.96e12
# K x T elementwise passes the fast path performs per sweep.
VPU_PASSES = 2.0


@dataclasses.dataclass
class EstepRoofline:
    points_per_sec: float  # attainable: perfect-overlap multi-ceiling bound
    serial_points_per_sec: float  # no-overlap lower bound (context only)
    flops_per_point: float  # executed bf16 MXU flops
    bound: str  # "mxu" | "vpu" | "hbm" — the binding ceiling


def estep_attainable(
    k: int,
    bytes_per_point: float = 224.0,
    mxu_flops: float = V5E_BF16_FLOPS,
    hbm_bytes: float = V5E_HBM_BYTES,
    vpu_rate: float = VPU_LANE_OPS,
    vpu_passes: float = VPU_PASSES,
) -> EstepRoofline:
    """Attainable fused E+M sweep throughput for K components, 1 chip."""
    matmul_flops = 2.0 * k * (80.0 + 32.0 + 8.0)
    t_mxu = matmul_flops / mxu_flops
    t_vpu = vpu_passes * k / vpu_rate
    t_hbm = bytes_per_point / hbm_bytes
    t = max(t_hbm, t_mxu, t_vpu)
    # Explicit tie-break order (hbm > mxu > vpu): on exact ties report the
    # cheaper-to-fix ceiling first; a float-keyed dict would collapse tied
    # keys to whichever was inserted last.
    if t == t_hbm:
        bound = "hbm"
    elif t == t_mxu:
        bound = "mxu"
    else:
        bound = "vpu"
    return EstepRoofline(
        points_per_sec=1.0 / t,
        serial_points_per_sec=1.0 / max(t_hbm, t_mxu + t_vpu),
        flops_per_point=matmul_flops,
        bound=bound,
    )
