"""Roofline model for the fused E-step kernel (BASELINE.md row 1).

Per point, per EM sweep the fused kernel performs two K-by-16 lane-major
MXU contractions (logits, suff-stats) and an O(K)-deep column softmax on
the VPU:

    matmul FLOPs / point = 2 contractions * 2 * K * PHI   (PHI = 16)
    VPU transcendentals / point ~= K (exp) + 2 (log, div)

Operands are fp32 at Precision.HIGHEST; on v5e-class MXUs fp32 sustains
~1/4 of the bf16 peak. The attainable bound combines the MXU time, the VPU
softmax time and the HBM stream (36 B/point in the [8, N] layout):

    t_point = max(hbm, mxu + vpu)      (softmax does not overlap the MXU
                                        passes that produce its input)

The >70%-of-roofline target (BASELINE.json:5) is measured against this
attainable number: a 128-deep bf16 matmul roofline is structurally
unreachable by ANY implementation of a 16-feature fp32 contraction
(including the reference's CUDA kernels on its GPU), so this is the honest
speed-of-light for the op. Empirical anchor: measured 2026-08-17 on the
1-chip v5e tunnel, K=512 fused sweep ~= 33 TFLOP/s fp32 (~67% of fp32 MXU
peak) before VPU accounting.
"""

from __future__ import annotations

import dataclasses

PHI = 16

# TPU v5e (1 chip): public specs.
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES = 819e9
# fp32 HIGHEST sustains ~1/4 of bf16 MXU peak.
F32_MXU_FLOPS = V5E_BF16_FLOPS / 4.0
# VPU transcendental throughput (exp/log), ops/sec — 8x128 lanes ~940 MHz.
VPU_TRANSCENDENTAL = 1.0e12


@dataclasses.dataclass
class EstepRoofline:
    points_per_sec: float  # attainable
    flops_per_point: float  # useful matmul flops
    bound: str  # "compute" | "hbm"


def estep_attainable(
    k: int,
    bytes_per_point: float = 36.0,
    mxu_flops: float = F32_MXU_FLOPS,
    hbm_bytes: float = V5E_HBM_BYTES,
    vpu_rate: float = VPU_TRANSCENDENTAL,
) -> EstepRoofline:
    """Attainable fused E+M sweep throughput for K components, 1 chip."""
    matmul_flops = 2.0 * 2.0 * k * PHI
    t_mxu = matmul_flops / mxu_flops
    t_vpu = (k + 2.0) / vpu_rate
    t_hbm = bytes_per_point / hbm_bytes
    t = max(t_hbm, t_mxu + t_vpu)
    return EstepRoofline(
        points_per_sec=1.0 / t,
        flops_per_point=matmul_flops,
        bound="hbm" if t_hbm >= t_mxu + t_vpu else "compute",
    )
