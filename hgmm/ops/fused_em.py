"""Fused Pallas TPU kernels for the EM E-step + M-step reduction.

The flagship kernels of the engine (SURVEY.md §2.1 items 9-10;
BASELINE.json:5: "the E-step runs as a tiled point x mixture log-likelihood
matmul+softmax Pallas kernel with hierarchy pruning expressed as masked
top-k gating; the M-step reduces per-component (Sw, Swx, Swxx^T) statistics
in VMEM").

Design (see hgmm.ops.gaussians for the math):

- Points live TRANSPOSED as [8, N] f32 (rows x, y, z, weight, 4 spare) so
  the long N axis rides the 128-lane dimension. `prepare_points` builds this
  layout once; the registration scan then never re-materializes it.
- Per grid step (one tile of T points):
    phi  [16, T]  degree-2 monomial features, built on the VPU
    d    [K, T] = Wt[K,16] @ phi    shifted log2-domain logits   (MXU)
    e    [K, T] = exp2(d)           unnormalized responsibilities (VPU)
    S   +[K, 16] = e @ (phi * scale)^T  contraction              (MXU)
  so the [N, K] responsibility matrix NEVER exists in HBM — the
  flash-attention idiom applied to EM (SURVEY.md §6.7).

- GLOBAL-SHIFT SOFTMAX (the fast path). Every K x T elementwise pass is
  real VPU time the MXU matmuls must hide (round-4 microbenchmarks,
  eval/roofline.py: at K=512 the kernel is MXU-bound at its shape rates,
  with the VPU at ~60% occupancy — keeping VPU work below the MXU time is
  exactly what makes the overlap possible), and the classic
  max/subtract/exp softmax spends 3 full K x T VPU passes. Instead we fold
  BOTH the -1/2 log2(e) logit scaling AND a global shift G =
  max_j sup_y log pi_j N(y) (gaussians.max_logit) into the packed weights:
  the MXU then emits d = log2[pi N] - G2 <= ~0 directly and the softmax is
  ONE exp2 pass. All outlier/normalizer corrections become SCALAR
  precomputation outside the kernel (see _softmax_scalars).
  Domain restriction (documented, tested): a point whose best component
  log-likelihood sits more than ~110 octaves (~76 nats, ~12 sigma in
  Mahalanobis distance) below the mixture's peak attainable log-likelihood
  progressively loses weight (its exp2 responsibilities underflow f32, and
  the scale floor caps its reweighting); with an outlier component
  configured such points are outlier-dominated anyway. precision="strict"
  keeps the exact per-column-max softmax for oracle comparisons.

- The registration kernel additionally applies the current SE(3) pose to
  the points IN-KERNEL (pose enters via SMEM scalars, so each scan
  iteration re-reads only the static [8, N] source buffer) and emits the
  O(1)-sized pose statistics: Horn cross-moments P^T Q and the Mahalanobis
  Gauss-Newton normal equations via two more lane-contracted matmuls.
- Grid steps on TPU execute sequentially per core: outputs with constant
  index maps act as VMEM accumulators (zeroed at step 0).

Every kernel has a dense jnp twin in hgmm.ops.em_ref; the equivalence suite
(tests/test_fused_em.py) compares them in interpret mode on CPU and
compiled on TPU.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hgmm.ops.em_ref import NEG_INF, EmStats, RegStats
from hgmm.ops.gaussians import PHI_DIM, fast_logit_margin, max_logit

# Point-tile width. Measured on v5e at K=512, N~2M (RESULTS.md §1/§5):
# with the round-3 MXU-sum kernel 8192 was ~2% faster than 4096; with the
# round-4 VPU-sum normalizer the ranking flips (raw 50-sweep probes:
# 8192 -> 2.92 ms/sweep, 4096 -> 2.69, 2048 -> 2.84) — the 16 MB f32
# logits intermediate at 8192 sits at the scoped-VMEM limit and squeezes
# double-buffering. 16384 fails to fit VMEM outright.
DEFAULT_TILE = 4096
_F32 = jnp.float32
_BF16 = jnp.bfloat16

# Fast-path ablation switch (kernel perf is measured, not assumed — see
# bench.py). HGMM_FAST_VARIANT:
#   0 (default): d f32 out of the MXU, exp2 on f32, explicit e -> bf16 cast
#     (2 K x T VPU passes/sweep; downstream MXU consumes bf16 e).
#   1: exp2 f32, e stays f32; downstream matmuls at DEFAULT precision round
#     the operands to bf16 inside the MXU ingest (1 K x T VPU pass if Mosaic
#     folds the convert, more if it doesn't — measure).
#   2: d cast to bf16 before exp2 (e comes out bf16). Cheapest if Mosaic's
#     bf16 exp2 is native, but the bf16 rounding of d is ~|d| * 2^-9
#     ABSOLUTE octaves, i.e. up to ~8% responsibility error for points far
#     below the global shift — measure both speed AND test tolerances.
_FAST_VARIANT = int(_os.environ.get("HGMM_FAST_VARIANT", "0"))
# Round-4 default flip: the kernel is MXU-bound (see eval/roofline.py
# history note), so the normalizer sum moved OFF the MXU to the VPU —
# measured 14% sweep win at K=512 (RESULTS.md §1). "1" restores the MXU
# ones-row sum for measurement.
_MXU_SUM = _os.environ.get("HGMM_MXU_SUM", "0") == "1"
# Intra-kernel splitting of the COMPONENT (sublane) axis: with HGMM_KSPLIT=c
# the fast-path em_stats body runs the logits matmul, exp2 and stats
# contraction in c K-chunks, halving (at c=2) the peak liveness of the f32
# [K, T] logits buffer — the tile sweep (RESULTS.md §1) suggests VMEM
# buffer liveness, not per-step overhead, is what gates Mosaic's cross-step
# double-buffering. The softmax normalizer still sums over the FULL K
# (partial sums added before the scale), so results are identical.
# Measurement switch, default 1.
_KSPLIT = int(_os.environ.get("HGMM_KSPLIT", "1"))
if _KSPLIT < 1:
    raise ValueError(f"HGMM_KSPLIT must be >= 1, got {_KSPLIT}")
# Intra-kernel sub-tiling of the point (lane) axis: with HGMM_SUBTILE=c the
# fast-path em_stats body runs c independent logits->exp2->stats chains per
# grid step, giving Mosaic explicit ILP to overlap chunk i's K x T/c exp2
# (VPU) with chunk i+1's logits matmul (MXU). 1 = the single-chain body.
# Measured on v5e (benchmarks/_subtile_probe.py): no win — see RESULTS.md;
# kept as the measurement switch. Divisibility is enforced per-call in
# _em_stats_call (the tile can shrink below DEFAULT_TILE for small N).
_SUBTILE = int(_os.environ.get("HGMM_SUBTILE", "1"))
if _SUBTILE < 1:
    raise ValueError(f"HGMM_SUBTILE must be >= 1, got {_SUBTILE}")
if _KSPLIT > 1 and _SUBTILE > 1:
    # The kernel body takes the SUBTILE branch first, silently ignoring
    # KSPLIT — a measurement run would report unchanged perf with no hint
    # the switch was inert (round-4 advisor item 4).
    raise ValueError(
        f"HGMM_KSPLIT={_KSPLIT} and HGMM_SUBTILE={_SUBTILE} are mutually "
        f"exclusive (the sub-tiled kernel body would silently ignore "
        f"KSPLIT); set at most one"
    )
# Round-5 HBM-stream slimming: the fast-path fit kernels previously
# streamed BOTH the f32 [16, T] phiw buffer (64 B/pt: 10 feature rows +
# weight row) and the bf16 [80, T] split buffer (160 B/pt). But the stats
# contraction re-splits phiw to bf16 hi/lo in-kernel anyway, and the split
# buffer's weight-slot rows (10 within each 16-row block) multiply against
# STRUCTURALLY ZERO packed-mixture columns (pack_loglik_weights is [10, K],
# padded to 16 with zeros; the shift folds into column 9) — so prepare_phi
# now splits phiw WITH its weight row (logits unchanged: w x 0 = 0) and
# with HGMM_SLIM_PHI=1 (default) the kernel reconstructs the f32 side as
# hi + lo from the split buffer and streams ONLY the 160 B/pt bf16 buffer:
# a 1.4x bandwidth cut on the HBM-bound shapes (K=64 config-1 flat and
# tree levels). Accuracy cost: the stats operand carries ~16 mantissa bits
# instead of 24 (the e operand is bf16 ~8 bits regardless, RNE-unbiased
# over the T reduction); the weight row reconstructs exactly for the 0/1
# bucketize weights and to 2^-16 otherwise. "0" restores the dual-stream
# layout for measurement.
#
# Mode "2" (DEFAULT) goes further: the [80, T] layout is
# [hi; lo; hi; lo; hi] — three COPIES of hi and two of lo — so only the
# distinct [32, T] (64 B/pt) needs to cross HBM; the kernel replicates it
# to the 80-row matmul operand in VMEM (whose bandwidth is not the
# bottleneck). Streams 64 B/pt total, 3.5x below the original 224.
# Measured on v5e (RESULTS.md §1c): K=64 unmasked 3.23 -> 5.20 Gpts/s
# (+61%), masked 3.12 -> 4.72; K=512 (MXU-bound) unchanged at 0.97-1.00.
_SLIM = int(_os.environ.get("HGMM_SLIM_PHI", "2"))
if _SLIM not in (0, 1, 2):
    raise ValueError(f"HGMM_SLIM_PHI must be 0, 1 or 2, got {_SLIM}")

# Signature salt: this environment's remote-compile service caches compiled
# executables keyed by the OUTER jit program's input signature, not its HLO
# body — an edit to kernel internals with unchanged caller shapes silently
# reuses the stale executable (observed: bit-identical EM trajectories
# across kernel versions). Padding the scalar SMEM rows by a source-derived
# width makes every source edit change every caller's signature. The kernels
# only ever read the leading slice; cost is a few SMEM bytes.
import zlib as _zlib

try:
    _SIG_SALT = _zlib.crc32(open(__file__, "rb").read()) % 48
except OSError:  # pragma: no cover
    _SIG_SALT = 0


def _salt_row(row: jax.Array) -> jax.Array:
    """Pad a [1, w] scalar row to [1, w + _SIG_SALT]."""
    return jnp.pad(row, ((0, 0), (0, _SIG_SALT)))

# The kernels run the softmax in LOG2 domain: prepare_mixture folds
# -1/2 * log2(e) into the packed weights so logits leave the MXU already
# base-2 (and already negated/halved — zero VPU passes), the VPU uses the
# cheaper native exp2, and the logsumexp converts back to nats with scalar
# corrections. Softmax responsibilities are base-invariant.
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453

# Scale floor: caps the per-point reweighting w / sum_e at ~2^110 so the
# [16,T] (phi * scale) operand of the stats matmul cannot overflow f32 even
# when a column's responsibilities all sit near the exp2 underflow edge.
_SCALE_FLOOR = 2.0 ** -110

# Precision of the hot matmuls:
#  - "fast": global-shift softmax (above); fp32 operands split into hi/lo
#    bf16 pairs where accuracy demands it; the logits matmul stacks
#    [Whi|Whi|Wlo] against [phi_hi;phi_lo;phi_hi] along the (heavily padded)
#    16->48-deep contraction, so full ~fp32 accuracy costs ONE bf16 MXU pass
#    instead of the 6 passes of Precision.HIGHEST. Measured 2026-08-17 on
#    v5e: HIGHEST runs the K=512 sweep at 3.9 TFLOP/s (its structural
#    ceiling); the split path raises the ceiling 6x on the logits matmul and
#    2x on the T-deep stats matmul.
#  - "strict": fp32 Precision.HIGHEST everywhere + exact per-column-max
#    softmax (bit-conservative twin).
DEFAULT_PRECISION = "fast"
_HI = jax.lax.Precision.HIGHEST
_LO = jax.lax.Precision.DEFAULT


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bf16_round(x):
    """Round f32 to the nearest bf16 value, STAYING in f32.

    At TRACE level this MUST be lax.reduce_precision, not
    x.astype(bf16).astype(f32): under jit XLA's algebraic simplifier folds
    the f32->bf16->f32 convert pair back to x (allow-excess-precision),
    which silently zeroes the lo parts of the hi/lo splits below. Verified
    on this TPU backend 2026-08-20: the jitted astype-based split returns
    lo == 0 exactly while the eager one returns the true residual — every
    jitted caller of the fast path was running at raw-bf16 logit accuracy,
    overflowing the global-shift softmax bound and NaN-ing whole tree fits.
    reduce_precision is an explicit HLO op the simplifier must honor.

    INSIDE Pallas kernel bodies Mosaic has no reduce_precision lowering
    (NotImplementedError), so the in-kernel splits keep the convert pair —
    safe there because Mosaic lowers the kernel jaxpr primitive-by-primitive
    without XLA's algebraic simplification (the on-chip kernel-vs-oracle
    equivalence suite pins this: a folded in-kernel split would fail the
    fp32-tolerance comparisons in tests/test_fused_em.py)."""
    return jax.lax.reduce_precision(x, 8, 7)


def _split_hi_lo(x, *, in_kernel: bool = False):
    """fp32 -> (bf16 hi, bf16 lo) with x ~= hi + lo (~16 mantissa bits)."""
    hi_f = x.astype(_BF16).astype(_F32) if in_kernel else _bf16_round(x)
    return hi_f.astype(_BF16), (x - hi_f).astype(_BF16)


def _split3(x):
    """fp32 -> (hi, mid, lo) bf16 triple with x ~= hi + mid + lo (~24
    mantissa bits — full f32 coverage). Used for the packed mixture weights,
    whose magnitude reaches 1/cov_reg for collapsed covariances: the
    monomial-basis quadratic form cancels catastrophically there, so the
    logits matmul needs ~f32 product accuracy (a 2-way split leaves
    |W.phi| * 2^-16 absolute error — measured as multi-nat logit error and
    EM-quality loss on thin-structure clouds). Trace-level only (see
    _bf16_round; never called inside kernel bodies)."""
    hi_f = _bf16_round(x)
    r = x - hi_f
    mid_f = _bf16_round(r)
    lo = (r - mid_f).astype(_BF16)
    return hi_f.astype(_BF16), mid_f.astype(_BF16), lo


# ---------------------------------------------------------------------------
# Layout preparation
# ---------------------------------------------------------------------------

def prepare_points(
    points: jax.Array,
    point_weights: jax.Array | None = None,
    tile: int = DEFAULT_TILE,
) -> jax.Array:
    """[N, 3] (+ optional [N] weights) -> [8, N_pad] transposed layout.

    Rows 0-2: x, y, z; row 3: point weight (0 for padding); rows 4-7 spare.
    Idempotent-ish: arrays already shaped [8, M] pass through untouched.
    """
    if points.ndim == 2 and points.shape[0] == 8 and points.shape[1] != 3:
        return points
    n = points.shape[0]
    n_pad = _round_up(max(n, 1), tile)
    if point_weights is None:
        w = jnp.ones((n,), points.dtype)
    else:
        w = point_weights.astype(points.dtype)
    pts_t = jnp.concatenate([points.T, w[None, :]], axis=0)  # [4, N]
    return jnp.pad(pts_t, ((0, 4), (0, n_pad - n)))


def _coord_bound(pts_t: jax.Array) -> jax.Array:
    """Max |coordinate| over the nonzero-weight columns of a prepared
    [8, N_pad] point buffer (zero-weight padding may sit at arbitrary
    coordinates and must not inflate the fast-path shift margin — see
    gaussians.fast_logit_margin)."""
    live = (pts_t[3:4] > 0).astype(pts_t.dtype)
    return jnp.max(jnp.abs(pts_t[0:3]) * live)


def prepare_phi(
    points: jax.Array,
    point_weights: jax.Array | None = None,
    tile: int = DEFAULT_TILE,
    precision: str = DEFAULT_PRECISION,
) -> tuple[jax.Array, jax.Array | None]:
    """Precompute the monomial-feature buffers the fit kernels consume.

    Returns (phiw, phi48):
      phiw  [16, N_pad] f32 — rows 0:10 the monomial features psi(x)
            (gaussians.features order), row 10 the point weight (0 for
            padding), rows 11:16 zero.
      phi48 bf16 split buffer (historical name; None for strict):
            [32, N_pad] = [hi; lo] of phiw under the default
            HGMM_SLIM_PHI=2 (the kernel replicates to the 80-row
            [hi;lo;hi;lo;hi] logits operand in VMEM), or
            [80, N_pad] = [hi; lo; hi; lo; hi] pre-replicated under
            modes 0/1 — the rhs layout of the fast-path logits matmul.

    Points are STATIC across EM sweeps, so callers inside a lax.scan get
    this hoisted out of the loop by XLA LICM — the per-sweep kernel then
    does ZERO feature(re)building/VPU hi-lo splitting for the logits side
    (keeps per-sweep VPU time well under the MXU time so the units
    overlap; see eval/roofline.py for the round-4 measured unit balance).
    """
    pts_t = prepare_points(points, point_weights, tile)  # [8, N_pad]
    x, y, z, w = pts_t[0:1], pts_t[1:2], pts_t[2:3], pts_t[3:4]
    one = jnp.ones_like(x)
    # Padding columns have x=y=z=0 -> features (0,..,0,1); their weight row
    # is 0, which zeroes their softmax scale and loglik in-kernel.
    phi = jnp.concatenate(
        [x * x, y * y, z * z, x * y, x * z, y * z, x, y, z, one], axis=0
    )  # [10, N_pad] f32
    zeros5 = jnp.zeros((5, phi.shape[1]), phi.dtype)
    phiw = jnp.concatenate([phi, w, zeros5], axis=0)  # [16, N_pad]
    if precision != "fast":
        return phiw, None
    # The weight row rides INSIDE the split (slot 10 of each 16-row block):
    # it multiplies structurally-zero packed-mixture columns in the logits
    # matmul (identical logits), and it lets the slim-stream kernel
    # (HGMM_SLIM_PHI) reconstruct the full [16, T] f32 operand — features
    # AND weights — as hi + lo without streaming phiw at all.
    hi, lo = _split_hi_lo(phiw)
    if _SLIM == 2:
        # Distinct rows only; the kernel replicates to the 80-row operand
        # in VMEM (see _SLIM mode 2).
        return phiw, jnp.concatenate([hi, lo], axis=0)  # [32, N_pad] bf16
    # [hi; lo; hi; lo; hi]: the rhs of the 80-deep logits contraction whose
    # block products against [Whi|Whi|Wmid|Wmid|Wlo] cover every hi/mid/lo
    # cross term except lo*lo (~2^-24 relative) — see prepare_mixture.
    phis = jnp.concatenate([hi, lo, hi, lo, hi], axis=0)  # [80, N_pad] bf16
    return phiw, phis


def prepare_mixture(
    W: jax.Array,
    k_pad_to: int = 8,
    precision: str = DEFAULT_PRECISION,
    shift: jax.Array | float | None = None,
) -> jax.Array:
    """pack_loglik_weights output [>=10, K] -> Wt [K_pad, 16] f32 (strict)
    or [K_pad, 80] bf16 = [Whi | Whi | Wmid | Wmid | Wlo] (fast).

    The -1/2 logit factor and the log2(e) base change are FOLDED IN, so the
    in-kernel matmul Wt @ phi yields base-2 logits directly — no K x T
    scaling pass. `shift` (natural-log scalar, usually gaussians.max_logit)
    is additionally subtracted via the constant-feature column so fast-path
    logits arrive pre-shifted (d <= ~0). Padded components get logit -1e31
    (below the NEG_INF mask floor).

    Fast-path layout: W is 3-way split (hi/mid/lo, ~24 mantissa bits) and
    phi 2-way (hi/lo); the block pairing against [phi_hi; phi_lo; phi_hi;
    phi_lo; phi_hi] yields Whi(phh+pll) + Wmid(phh+pll) + Wlo*phh — every
    cross term except Wlo*pll (~2^-24 relative), i.e. ~f32-accurate logits
    from ONE bf16 MXU pass over a (well-padded anyway) 80-deep contraction.
    """
    d, k = W.shape
    Wt = W.T * _F32(-0.5 * LOG2E)  # [K, d]: folded -1/2, log2 domain
    if d < 16:
        Wt = jnp.pad(Wt, ((0, 0), (0, 16 - d)))
    if shift is not None:
        Wt = Wt.at[:, 9].add(-LOG2E * jnp.asarray(shift, _F32))
    k_pad = _round_up(k, k_pad_to)
    if k_pad != k:
        pad_row = jnp.zeros((k_pad - k, 16), Wt.dtype).at[:, 9].set(-1e31)
        Wt = jnp.concatenate([Wt, pad_row], axis=0)
    if precision == "fast":
        hi, mid, lo = _split3(Wt.astype(_F32))
        Wt = jnp.concatenate([hi, hi, mid, mid, lo], axis=1)  # [K_pad, 80]
    return Wt


def _softmax_scalars(
    outlier_logit: jax.Array | float | None,
    shift: jax.Array | float | None,
) -> jax.Array:
    """Precompute the scalar softmax corrections as a [1, 8] f32 SMEM row.

    With the global shift G folded into the weights, every quantity the
    softmax needs beyond sum_e is a SCALAR function of (G, outlier):
      slot 0  oe  = 2^(o2 - G2)     outlier mass in the shifted domain
                                    (+inf when the outlier dwarfs G —
                                    scale = w / inf = 0 is the right limit)
      slot 1  c1  = 2^(G2 - m2)     lse normalizer coefficients with
      slot 2  c2  = 2^(o2 - m2)     m2 = max(G2, o2), so the log argument
                                    never overflows
      slot 3  m2 * ln2              natural-log lse base
      slot 4  o2 = outlier * log2e  raw outlier logit for the strict path
    where G2 = G * log2e. outlier None => oe = c2 = 0 (and o2 = NEG_INF).
    shift None (strict-only callers) treats G = 0.
    """
    g2 = LOG2E * jnp.asarray(0.0 if shift is None else shift, _F32)
    if outlier_logit is None:
        row = jnp.stack(
            [jnp.zeros((), _F32), jnp.ones((), _F32), jnp.zeros((), _F32),
             g2 * LN2, jnp.full((), NEG_INF, _F32)]
        )
    else:
        o2 = LOG2E * jnp.asarray(outlier_logit, _F32)
        m2 = jnp.maximum(g2, o2)
        row = jnp.stack(
            [jnp.exp2(o2 - g2), jnp.exp2(g2 - m2), jnp.exp2(o2 - m2),
             m2 * LN2, o2]
        )
    # Width 8 + _SIG_SALT: kernels read only [0:8]; the salt defeats the
    # stale remote-compile cache (see _SIG_SALT above).
    return _salt_row(jnp.pad(row, (0, 3))[None, :])


# ---------------------------------------------------------------------------
# Kernel building blocks
# ---------------------------------------------------------------------------

def _phi_of(x, y, z):
    """[1,T] coordinate rows -> [16,T] monomial features (VPU)."""
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    return jnp.concatenate(
        [x * x, y * y, z * z, x * y, x * z, y * z, x, y, z, one,
         zero, zero, zero, zero, zero, zero],
        axis=0,
    )


def _logits_of(wt, phi):
    """wt [K,16] f32 (strict) or [K,80] bf16 (fast); phi [16,T] f32
    -> [K,T] shifted base-2 logits (the -1/2 and log2e factors — and the
    global shift on the fast path — are folded into wt; see prepare_mixture
    for the 80-deep split layout)."""
    if wt.dtype == _BF16:
        hi, lo = _split_hi_lo(phi, in_kernel=True)
        phi_cat = jnp.concatenate([hi, lo, hi, lo, hi], axis=0)  # [80, T]
        return jnp.dot(wt, phi_cat, preferred_element_type=_F32, precision=_LO)
    return jnp.dot(wt, phi, preferred_element_type=_F32, precision=_HI)


def _stats_dot_t(e, phi, fast: bool):
    """sum_t phi[:,t] e[:,t]^T: [16,T] x [K,T] -> S^T, TRANSPOSED output.

    The output's SMALL dim (16/32 stat rows) rides the sublane axis — which
    streams through the MXU at 8-row granularity — while the LARGE K rides
    the 128-padded lane axis. The naive [K,T]x[16,T]->[K,16] orientation pads
    the 16 output lanes to 128 (4x wasted MXU passes at K=512); transposed,
    padding is zero. The caller folds hi+lo and transposes the tiny [32,K]
    accumulator ONCE outside the kernel.

    Fast path: e enters at bf16 (explicitly cast, or rounded inside the MXU
    at DEFAULT precision — its rounding error is RNE-unbiased and averages
    out over the T-point reduction) while phi keeps full hi/lo precision
    stacked on the sublane axis: [32,T] x [K,T] -> [32,K] with rows
    0:16 = hi-part, 16:32 = lo-part."""
    dims = (((1,), (1,)), ((), ()))
    if not fast:
        return jax.lax.dot_general(
            phi, e, dims, preferred_element_type=_F32, precision=_HI
        )  # [16, K]
    phi_hi, phi_lo = _split_hi_lo(phi, in_kernel=True)
    phi_cat = jnp.concatenate([phi_hi, phi_lo], axis=0)  # [32, T]
    return jax.lax.dot_general(
        phi_cat, e, dims, preferred_element_type=_F32, precision=_LO
    )  # [32, K]


def _top_k_mask(logits, top_k: int):
    """Keep each COLUMN's top_k entries (K axis = sublanes): iterative
    max-remove, ties kept at the threshold (matches em_ref semantics)."""
    cur = logits
    kth = None
    for _ in range(top_k):
        kth = jnp.max(cur, axis=0, keepdims=True)
        cur = jnp.where(cur >= kth, NEG_INF, cur)
    return jnp.where(logits >= kth, logits, NEG_INF)


def _exp_fast(d):
    """exp2 per _FAST_VARIANT (see module header)."""
    if _FAST_VARIANT == 2:
        return jax.lax.exp2(d.astype(_BF16))
    e = jax.lax.exp2(d)
    if _FAST_VARIANT == 0:
        e = e.astype(_BF16)
    return e


def _softmax_fast(d, w_row, sm):
    """Global-shift column softmax: d [K,T] = base-2 logits pre-shifted by
    G (folded into the weights), sm the _softmax_scalars row. ONE K x T
    transcendental pass (+ the variant's cast); the normalizer sum rides
    the MXU; everything else is [1,T]-sized.

    Returns (e, scale, lse, sum_e): gamma = e * scale. scale is NOT applied
    here — callers fold it into the [16,T]-sized side of their downstream
    matmul, saving a full K x T VPU pass per sweep. Dead columns (all
    responsibilities underflow, no outlier) get sum_e = 0 => zero stats and
    zero loglik, per the documented fast-path domain restriction.
    """
    if _MXU_SUM:
        # Normalizer sum rides the MXU. Round-3 default — refuted by the
        # round-4 microbenchmarks: the kernel is MXU-bound (not VPU-bound),
        # so an [8,K]@[K,T] ones-sum adds ~130 ps/pt to the BOTTLENECK unit
        # while the VPU has slack (measured 2.692 vs 3.127 ms/sweep at
        # tile 4096, K=512 — the VPU sum wins by 14%). Kept as a switch
        # for measurement.
        e = _exp_fast(d)
        ones = jnp.ones((8, e.shape[0]), e.dtype)
        sum_e = jnp.dot(ones, e, preferred_element_type=_F32, precision=_LO)[
            0:1
        ]  # [1,T]
    else:
        # VPU widening reduction over the ROUNDED e: summing the same
        # values the stats matmul consumes keeps gamma mass conservation
        # (sum_k gamma = w) consistent under bf16 rounding — summing the
        # unrounded f32 exp2 output instead decorrelates numerator and
        # denominator rounding (measured: pushed masked suff-stats just
        # past the twin-equivalence tolerance). dtype=f32 lets Mosaic fuse
        # the widening into the reduction, no materialized cast-back pass.
        e = _exp_fast(d)
        sum_e = jnp.sum(e, axis=0, keepdims=True, dtype=_F32)
    # _SCALE_FLOOR keeps scale * phi inside f32 even at the underflow edge;
    # its relative effect on live columns is < 2^-80.
    scale = w_row / (sum_e + sm[0, 0] + _SCALE_FLOOR)
    tot = sum_e * sm[0, 1] + sm[0, 2]
    lse = jnp.where(tot > 0, (sm[0, 3] + jnp.log(tot)) * w_row, 0.0)
    return e, scale, lse, sum_e


def _softmax_strict(logits, w_row, out2):
    """Exact per-column-max softmax (log2 domain), the bit-conservative
    twin of em_ref._soft. The normalizer/lse run in the true max domain
    m2 = max(column max, outlier), so an outlier-dominated column
    (outlier >> every gaussian logit) yields lse -> outlier exactly instead
    of saturating (the round-1 advisor finding). Fully-masked columns with
    out2 < -126 octaves are the one remaining divergence (lse 0, not
    outlier) — they only arise for padding points, whose weight row is 0.
    """
    m_raw = jnp.max(logits, axis=0, keepdims=True)
    alive = m_raw > NEG_INF
    shift = jnp.where(alive, m_raw, 0.0)
    e = jax.lax.exp2(logits - shift)  # masked entries: exp2(-1e30) = 0
    sum_e = jnp.sum(e, axis=0, keepdims=True)
    s = sum_e + jax.lax.exp2(out2 - shift)  # +inf => scale 0 (outlier wins)
    scale = jnp.where(s > 0, w_row / jnp.maximum(s, 1e-38), 0.0)
    m2 = jnp.maximum(shift, jnp.where(alive, out2, NEG_INF))
    tot = sum_e * jax.lax.exp2(shift - m2) + jax.lax.exp2(out2 - m2)
    lse = jnp.where(tot > 0, (m2 * _F32(LN2) + jnp.log(tot)) * w_row, 0.0)
    return e, scale, lse, sum_e


# ---------------------------------------------------------------------------
# em_stats kernel (fit E+M fused)
# ---------------------------------------------------------------------------

def _em_stats_kernel(
    phiw_ref, wt_ref, sm_ref, out_s_ref, out_ll_ref, *, branch,
    phi48_ref=None, parent_ref=None, slim=False,
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_s_ref[:] = jnp.zeros_like(out_s_ref)
        out_ll_ref[0, 0] = 0.0

    fast = wt_ref.dtype == _BF16
    p48 = phi48_ref[:] if phi48_ref is not None else None
    if p48 is not None and p48.shape[0] == 32:
        # _SLIM mode 2: only the distinct [hi; lo] rows crossed HBM;
        # replicate to the [hi; lo; hi; lo; hi] 80-row matmul operand in
        # VMEM (matches prepare_mixture's [Whi|Whi|Wmid|Wmid|Wlo] blocks).
        hi_b, lo_b = p48[0:16], p48[16:32]
        p48 = jnp.concatenate([hi_b, lo_b, hi_b, lo_b, hi_b], axis=0)
    if slim:
        # Slim stream (see _SLIM): the f32 [16, T] side — features AND the
        # weight row — reconstructs as hi + lo of the split buffer's first
        # two blocks; phiw is not an input at all.
        phiw = p48[0:16].astype(_F32) + p48[16:32].astype(_F32)
    else:
        phiw = phiw_ref[:]  # [16, T] f32: rows 0:10 features, row 10 weight
    w = phiw[10:11]
    if fast and _SUBTILE > 1 and parent_ref is None:
        # Sub-tiled body (see _SUBTILE): c independent chains per grid step.
        wt = wt_ref[:]
        phi48 = p48
        ch = phiw.shape[1] // _SUBTILE
        s_acc = jnp.zeros_like(out_s_ref)
        ll = jnp.zeros((), _F32)
        for c in range(_SUBTILE):
            sl = slice(c * ch, (c + 1) * ch)
            d = jnp.dot(
                wt, phi48[:, sl], preferred_element_type=_F32, precision=_LO
            )
            e, scale, lse, _ = _softmax_fast(d, w[:, sl], sm_ref)
            s_acc = s_acc + _stats_dot_t(e, phiw[:, sl] * scale, fast=True)
            ll = ll + jnp.sum(lse)
        out_s_ref[:] = out_s_ref[:] + s_acc
        out_ll_ref[0, 0] += ll
        return
    if (
        fast and _KSPLIT > 1 and parent_ref is None
        and wt_ref.shape[0] % _KSPLIT == 0
    ):
        # K-split body (see _KSPLIT): per K-chunk logits -> exp2 -> partial
        # normalizer; scale couples the chunks only through the full-K sum,
        # so stats per chunk land in their own out_s columns. Identical
        # math to the single-chunk body.
        wt = wt_ref[:]
        phi48 = p48
        kh = wt.shape[0] // _KSPLIT
        es = []
        sum_e = None
        for c in range(_KSPLIT):
            d = jnp.dot(
                wt[c * kh : (c + 1) * kh], phi48,
                preferred_element_type=_F32, precision=_LO,
            )
            e_c = _exp_fast(d)
            s_c = jnp.sum(e_c, axis=0, keepdims=True, dtype=_F32)
            es.append(e_c)
            sum_e = s_c if sum_e is None else sum_e + s_c
        scale = w / (sum_e + sm_ref[0, 0] + _SCALE_FLOOR)
        tot = sum_e * sm_ref[0, 1] + sm_ref[0, 2]
        lse = jnp.where(tot > 0, (sm_ref[0, 3] + jnp.log(tot)) * w, 0.0)
        phis = phiw * scale
        s_tile = jnp.concatenate(
            [_stats_dot_t(e_c, phis, fast=True) for e_c in es], axis=1
        )  # [32, K]
        out_s_ref[:] = out_s_ref[:] + s_tile
        out_ll_ref[0, 0] += jnp.sum(lse)
        return
    if fast:
        # Precomputed [hi; lo; hi] bf16 features — no per-sweep feature
        # build or hi/lo split on the VPU; output is already the shifted
        # base-2 logit d (every scaling folded into wt).
        d = jnp.dot(
            wt_ref[:], p48, preferred_element_type=_F32, precision=_LO
        )
    else:
        d = jnp.dot(
            wt_ref[:], phiw, preferred_element_type=_F32, precision=_HI
        )  # wt feature cols 10:16 are zero, so the w row is inert

    if parent_ref is not None:
        comp = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        par = parent_ref[:]  # [1, T] int32
        ok = (comp // branch) == par
        d = jnp.where(ok, d, NEG_INF)

    if fast:
        e, scale, lse, _ = _softmax_fast(d, w, sm_ref)
    else:
        e, scale, lse, _ = _softmax_strict(d, w, sm_ref[0, 4])
    # S^T += (scale * phi) . e^T — scale folded into the 16-row side
    # (16/K-th the elementwise work of scaling gamma); output transposed so
    # K rides the lanes (see _stats_dot_t). Row 10 (scaled weights) is
    # garbage sliced away by the caller.
    s_tile = _stats_dot_t(e, phiw * scale, fast=fast)
    out_s_ref[:] = out_s_ref[:] + s_tile
    out_ll_ref[0, 0] += jnp.sum(lse)


def _em_stats_call(
    phiw, phi48, wt, sm, parent=None, branch=8, tile=DEFAULT_TILE
):
    n_pad = phiw.shape[1]
    tile = min(tile, n_pad)
    assert n_pad % tile == 0, (n_pad, tile)
    k_pad, w_lanes = wt.shape
    fast = wt.dtype == _BF16
    if fast and _SUBTILE > 1 and parent is None and tile % _SUBTILE != 0:
        # The sub-tiled kernel body slices the tile into _SUBTILE equal
        # chunks; a remainder would be silently dropped from the stats.
        raise ValueError(
            f"HGMM_SUBTILE={_SUBTILE} does not divide the point tile "
            f"{tile}; stats would silently drop {tile % _SUBTILE} columns"
        )
    if fast and _KSPLIT > 1 and parent is None and k_pad % _KSPLIT != 0:
        # The kernel body falls through to the single-chunk path when K
        # doesn't divide — raise so a measurement run can't silently report
        # unchanged perf with the switch inert (round-4 advisor item 4).
        raise ValueError(
            f"HGMM_KSPLIT={_KSPLIT} does not divide the padded component "
            f"count {k_pad}; the K-split kernel body would be silently "
            f"bypassed"
        )
    # Slim stream (see _SLIM): the fast single-chain body reconstructs the
    # f32 side from the split buffer, so phiw is dropped from the pallas
    # inputs entirely — 160 B/pt streamed instead of 224. The SUBTILE/
    # KSPLIT measurement bodies still read phiw directly.
    slim = fast and _SLIM > 0 and _SUBTILE == 1 and _KSPLIT == 1
    grid = (n_pad // tile,)
    in_specs = [
        pl.BlockSpec((k_pad, w_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        # Full (salted) row: SMEM blocks must cover the whole array.
        pl.BlockSpec(sm.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [wt, sm]
    if not slim:
        in_specs.insert(
            0,
            pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        )
        args.insert(0, phiw)
    kw = {"branch": branch, "slim": slim}
    names = []
    if fast:
        in_specs.append(
            pl.BlockSpec(
                (phi48.shape[0], tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        )
        args.append(phi48)
        names.append("phi48_ref")
    if parent is not None:
        in_specs.append(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(parent)
        names.append("parent_ref")

    def kernel(*refs):
        i = 0 if slim else 1
        phiw_ref = None if slim else refs[0]
        wt_ref, sm_ref = refs[i], refs[i + 1]
        extra = dict(zip(names, refs[i + 2 : i + 2 + len(names)]))
        out_s, out_ll = refs[i + 2 + len(names) :]
        _em_stats_kernel(phiw_ref, wt_ref, sm_ref, out_s, out_ll,
                         **kw, **extra)

    s_rows = 32 if fast else 16
    # Executed MXU work per tile: logits (w_lanes-deep) + stats (tile-deep,
    # s_rows output rows) + the fast path's MXU normalizer sum.
    flops_tile = 2 * k_pad * w_lanes * tile + 2 * s_rows * k_pad * tile
    if fast and _MXU_SUM:
        flops_tile += 2 * 8 * k_pad * tile
    if slim:
        bytes_pt = 2 * phi48.shape[0]  # split-phi bf16 only
    elif fast:
        bytes_pt = 64 + 2 * phi48.shape[0]  # phiw f32 + split-phi bf16
    else:
        bytes_pt = 64
    s_out, ll_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((s_rows, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_rows, k_pad), _F32),
            jax.ShapeDtypeStruct((1, 1), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * grid[0],
            bytes_accessed=n_pad * bytes_pt + k_pad * w_lanes * (2 if fast else 4)
            + s_rows * k_pad * 4 * 2,
            transcendentals=k_pad * n_pad,
        ),
        interpret=_interpret(),
    )(*args)
    # Fold the hi/lo halves and restore the [K_pad, 16] orientation — a tiny
    # one-time transpose outside the hot kernel.
    if s_rows == 32:
        s_out = s_out[0:16] + s_out[16:32]
    return s_out.T, ll_out[0, 0]


def _fast_shift(W, coord_bound, shift):
    """Resolve the fast path's folded softmax shift: caller-exact bound (or
    the max_logit fallback) plus the bf16 logit-error margin.

    Overflow-proofing: absorbing the error bound into the shift keeps exp2
    from overflowing for any finite mixture (responsibilities are
    shift-invariant; the lse correction is exact)."""
    if shift is None:
        shift = max_logit(W)  # fallback; see gaussians.max_logit_params
    return shift + fast_logit_margin(W, coord_bound)


def em_stats_prepared(
    phiw, phi48, coord_bound, W, outlier_logit=None, tile=DEFAULT_TILE,
    precision=DEFAULT_PRECISION, shift=None,
):
    """em_stats on pre-built feature buffers (prepare_phi output).

    Fit loops MUST use this (via ops.prepare) rather than passing raw
    points per sweep: the [96, N]-sized feature buffers are loop-invariant
    but too large for XLA's while-loop invariant code motion, so the
    raw-points path rebuilds ~46 B/point of HBM traffic EVERY sweep —
    measured on v5e as 182 Mpts/s full-EM vs 690 Mpts/s kernel-only at
    N=2M, K=512. Only the O(K) mixture packing stays per-sweep here."""
    k = W.shape[1]
    if precision != "fast":
        shift = None
    else:
        shift = _fast_shift(W, coord_bound, shift)
    wt = prepare_mixture(W, precision=precision, shift=shift)
    sm = _softmax_scalars(outlier_logit, shift)
    s, ll = _em_stats_call(phiw, phi48, wt, sm, tile=tile)
    return EmStats(S=s[:k, :PHI_DIM], loglik=ll)


def em_stats_masked_prepared(
    phiw, phi48, coord_bound, W, parent, branch, tile=DEFAULT_TILE,
    precision=DEFAULT_PRECISION, shift=None,
):
    """em_stats_masked on pre-built feature buffers (see em_stats_prepared)."""
    k = W.shape[1]
    n_pad = phiw.shape[1]
    par = parent.astype(jnp.int32)
    par = jnp.pad(par, (0, n_pad - par.shape[0]), constant_values=-1)[None, :]
    if precision != "fast":
        shift = None
    else:
        shift = _fast_shift(W, coord_bound, shift)
    wt = prepare_mixture(W, precision=precision, shift=shift)
    sm = _softmax_scalars(None, shift)
    s, ll = _em_stats_call(
        phiw, phi48, wt, sm, parent=par, branch=branch, tile=tile
    )
    return EmStats(S=s[:k, :PHI_DIM], loglik=ll)


def em_stats(points, W, point_weights=None, outlier_logit=None, tile=DEFAULT_TILE, precision=DEFAULT_PRECISION, shift=None):
    """Pallas twin of em_ref.em_stats. Accepts [N,3] points or a prepared
    [8, N_pad] buffer from prepare_points. One-shot entry — EM loops should
    prepare once and call em_stats_prepared per sweep (see its docstring)."""
    pts_t = prepare_points(points, point_weights, tile)
    phiw, phi48 = prepare_phi(pts_t, None, tile, precision)
    return em_stats_prepared(
        phiw, phi48, _coord_bound(pts_t), W, outlier_logit, tile=tile,
        precision=precision, shift=shift,
    )


def em_stats_masked(
    points, W, parent, branch, point_weights=None, tile=DEFAULT_TILE,
    precision=DEFAULT_PRECISION, shift=None,
):
    """Pallas twin of em_ref.em_stats_masked (tree-fit child masking)."""
    pts_t = prepare_points(points, point_weights, tile)
    phiw, phi48 = prepare_phi(pts_t, None, tile, precision)
    return em_stats_masked_prepared(
        phiw, phi48, _coord_bound(pts_t), W, parent, branch, tile=tile,
        precision=precision, shift=shift,
    )


# ---------------------------------------------------------------------------
# assign kernel (hard argmax association)
# ---------------------------------------------------------------------------

def _assign_kernel(pts_ref, wt_ref, out_ref, *, branch, parent_ref=None):
    pts = pts_ref[:]
    phi = _phi_of(pts[0:1], pts[1:2], pts[2:3])
    logits = _logits_of(wt_ref[:], phi)
    if parent_ref is not None:
        comp = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        ok = (comp // branch) == parent_ref[:]
        logits = jnp.where(ok, logits, NEG_INF)
    m = jnp.max(logits, axis=0, keepdims=True)
    comp = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    big = jnp.int32(logits.shape[0])
    idx = jnp.min(jnp.where(logits >= m, comp, big), axis=0, keepdims=True)
    out_ref[:] = idx


def assign(points, W, parent=None, branch=None, tile=DEFAULT_TILE, precision=DEFAULT_PRECISION):
    """Pallas twin of em_ref.assign. Accepts raw [N, 3] points (returns [N])
    or a prepared [8, N_pad] buffer (returns [N_pad]; padding columns get an
    arbitrary component — their zero weight keeps them inert downstream)."""
    prepared_in = points.ndim == 2 and points.shape[0] == 8 and points.shape[1] != 3
    pts_t = prepare_points(points, None, tile)
    n = pts_t.shape[1] if prepared_in else points.shape[0]
    n_pad = pts_t.shape[1]
    t = min(tile, n_pad)
    wt = prepare_mixture(W, precision=precision)
    k_pad = wt.shape[0]
    in_specs = [
        pl.BlockSpec((8, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [pts_t, wt]
    if parent is not None:
        par = jnp.pad(
            parent.astype(jnp.int32), (0, n_pad - parent.shape[0]),
            constant_values=0,
        )[None, :]
        in_specs.append(
            pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(par)

        def kernel(p, w, par_ref, o):
            _assign_kernel(p, w, o, branch=branch, parent_ref=par_ref)
    else:
        kernel = functools.partial(_assign_kernel, branch=0)

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // t,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        interpret=_interpret(),
    )(*args)
    return out[0, :n]


# ---------------------------------------------------------------------------
# Registration kernel: pose applied in-kernel, O(1) outputs
# ---------------------------------------------------------------------------

def _reg_stats_kernel(
    pts_ref, pose_ref, wt_ref, aux_ref, sm_ref,
    out_horn_ref, out_a_ref, out_b_ref, out_ll_ref, *, top_k,
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_horn_ref[:] = jnp.zeros_like(out_horn_ref)
        out_a_ref[:] = jnp.zeros_like(out_a_ref)
        out_b_ref[:] = jnp.zeros_like(out_b_ref)
        out_ll_ref[0, 0] = 0.0

    pts = pts_ref[:]
    x0, x1, x2, w = pts[0:1], pts[1:2], pts[2:3], pts[3:4]

    # Apply pose in-kernel: y = R x + t (pose scalars from SMEM).
    p = pose_ref
    y0 = p[0, 0] * x0 + p[0, 1] * x1 + p[0, 2] * x2 + p[0, 9]
    y1 = p[0, 3] * x0 + p[0, 4] * x1 + p[0, 5] * x2 + p[0, 10]
    y2 = p[0, 6] * x0 + p[0, 7] * x1 + p[0, 8] * x2 + p[0, 11]

    phi = _phi_of(y0, y1, y2)
    logits = _logits_of(wt_ref[:], phi)
    if top_k is not None:
        logits = _top_k_mask(logits, top_k)
    fast = aux_ref.dtype == _BF16
    if fast:
        e, scale, lse, sum_e = _softmax_fast(logits, w, sm_ref)
    else:
        e, scale, lse, sum_e = _softmax_strict(logits, w, sm_ref[0, 4])

    # One matmul for every per-point mixture reduction, with the softmax
    # scale applied to the [16,T] RESULT rather than the [K,T] operand:
    # aux rows 0-2 = mu^T, 3-8 = A6^T (packed precisions), 9-11 = b3^T.
    # Fast path: aux hi/lo stacked on the output rows ([32,K] @ [K,T] ->
    # [32,T], summed 16+16), e consumed at bf16 (RNE noise averages out
    # over the K-deep contraction). One matmul unit.
    if fast:
        red2 = jnp.dot(
            aux_ref[:], e, preferred_element_type=_F32, precision=_LO
        )  # [32, T]
        red = (red2[0:16] + red2[16:32]) * scale  # [16, T]
    else:
        red = jnp.dot(
            aux_ref[:], e, preferred_element_type=_F32, precision=_HI
        ) * scale  # [16, T]
    nu0, nu1, nu2 = red[0:1], red[1:2], red[2:3]
    m00, m11, m22 = red[3:4], red[4:5], red[5:6]
    m01, m02, m12 = red[6:7], red[7:8], red[8:9]
    u0, u1, u2 = red[9:10], red[10:11], red[11:12]
    # sum_j gamma = scale * sum_j e (the outlier term is excluded from the
    # Gaussian-responsibility mass; sum_e comes back from the softmax — on
    # the fast path it rode the MXU, so no extra K x T reduction pass here).
    w_eff = scale * sum_e  # [1,T]

    dims = (((1,), (1,)), ((), ()))

    # ---- Horn cross-moments: P [4,T] = [x;1], Q [4,T] = [nu; w_eff].
    # Fast path: hi/lo splits stacked on BOTH tiny output axes — one [8,T]
    # x [8,T] bf16 dot whose 4 4x4 blocks are the hi/lo cross terms
    # (hh + hl + lh ~= full fp32; output padding makes the width free).
    one = jnp.ones_like(x0)
    P = jnp.concatenate([x0, x1, x2, one], axis=0)
    Q = jnp.concatenate([nu0, nu1, nu2, w_eff], axis=0)
    if fast:
        p_hi, p_lo = _split_hi_lo(P, in_kernel=True)
        q_hi, q_lo = _split_hi_lo(Q, in_kernel=True)
        pc = jnp.concatenate([p_hi, p_lo], axis=0)  # [8, T]
        qc = jnp.concatenate([q_hi, q_lo], axis=0)  # [8, T]
        o8 = jax.lax.dot_general(pc, qc, dims, preferred_element_type=_F32,
                                 precision=_LO)  # [8, 8]
        horn = o8[0:4, 0:4] + o8[0:4, 4:8] + o8[4:8, 0:4]
    else:
        horn = jax.lax.dot_general(
            P, Q, dims, preferred_element_type=_F32, precision=_HI
        )  # [4,4]
    out_horn_ref[:] = out_horn_ref[:] + jnp.pad(horn, ((0, 4), (0, 124)))

    # ---- Mahalanobis GN. Residual r = M y - u (gamma folded into M,u).
    r0 = m00 * y0 + m01 * y1 + m02 * y2 - u0
    r1 = m01 * y0 + m11 * y1 + m12 * y2 - u1
    r2 = m02 * y0 + m12 * y1 + m22 * y2 - u2

    zero = jnp.zeros_like(x0)
    # J rows (J = [Omega | I], Omega = -[y]_x):
    # J[0,:] = (0,  y2, -y1, 1, 0, 0)
    # J[1,:] = (-y2, 0,  y0, 0, 1, 0)
    # J[2,:] = (y1, -y0,  0, 0, 0, 1)
    J0 = jnp.concatenate([zero, y2, -y1, one, zero, zero], axis=0)  # [6,T]
    J1 = jnp.concatenate([-y2, zero, y0, zero, one, zero], axis=0)
    J2 = jnp.concatenate([y1, -y0, zero, zero, zero, one], axis=0)
    # (M J) rows: MJ[i,:] = sum_k M[i,k] J[k,:].
    MJ0 = m00 * J0 + m01 * J1 + m02 * J2
    MJ1 = m01 * J0 + m11 * J1 + m12 * J2
    MJ2 = m02 * J0 + m12 * J1 + m22 * J2
    # A = sum_i sum_t J_i^T (M J)_i and b = -sum_i J_i^T r_i, one matmul
    # per residual row i. Fast path: [Jhi;Jlo] [12,T] against
    # [MJhi;MJlo;rhi;rlo] [14,T] — the output blocks are every hi/lo cross
    # term of BOTH A and b in a single bf16 dot (output padding is free).
    if fast:
        def _row_dot(J, MJ, r):
            j_hi, j_lo = _split_hi_lo(J, in_kernel=True)
            mj_hi, mj_lo = _split_hi_lo(MJ, in_kernel=True)
            r_hi, r_lo = _split_hi_lo(r, in_kernel=True)
            lhs = jnp.concatenate([j_hi, j_lo], axis=0)  # [12, T]
            rhs = jnp.concatenate([mj_hi, mj_lo, r_hi, r_lo], axis=0)  # [14, T]
            o = jax.lax.dot_general(lhs, rhs, dims, preferred_element_type=_F32,
                                    precision=_LO)  # [12, 14]
            a_i = o[0:6, 0:6] + o[0:6, 6:12] + o[6:12, 0:6]
            b_i = o[0:6, 12:13] + o[0:6, 13:14] + o[6:12, 12:13]
            return a_i, b_i

        a0, bb0 = _row_dot(J0, MJ0, r0)
        a1, bb1 = _row_dot(J1, MJ1, r1)
        a2, bb2 = _row_dot(J2, MJ2, r2)
        A = a0 + a1 + a2
        b = -(bb0 + bb1 + bb2)  # [6,1]
    else:
        def _lane_dot(a, bb):
            return jax.lax.dot_general(
                a, bb, dims, preferred_element_type=_F32, precision=_HI
            )

        A = _lane_dot(J0, MJ0) + _lane_dot(J1, MJ1) + _lane_dot(J2, MJ2)
        # b via a [6,T]x[2,T] matmul (a [1,T] rhs lowers to an unsupported
        # multi_reduction in Mosaic).
        def _pad2(r):
            return jnp.concatenate([r, jnp.zeros_like(r)], axis=0)

        b2 = (_lane_dot(J0, _pad2(r0)) + _lane_dot(J1, _pad2(r1))
              + _lane_dot(J2, _pad2(r2)))
        b = -b2[:, 0:1]  # [6,1]
    out_a_ref[0:6, 0:6] = out_a_ref[0:6, 0:6] + A
    out_b_ref[0:6, 0:1] = out_b_ref[0:6, 0:1] + b
    out_ll_ref[0, 0] += jnp.sum(lse)


def _prepare_aux(mu, A6, b3, precision: str = DEFAULT_PRECISION):
    """[K,3] mu, [K,6] A6, [K,3] b3 -> aux [16, K_pad] f32 (strict) or
    [32, K_pad] bf16 = [aux_hi; aux_lo] sublane-stacked (fast)."""
    aux = jnp.concatenate([mu, A6, b3], axis=1).T  # [12, K]
    aux = jnp.pad(aux, ((0, 4), (0, _round_up(aux.shape[1], 8) - aux.shape[1])))
    if precision == "fast":
        hi, lo = _split_hi_lo(aux.astype(_F32))
        aux = jnp.concatenate([hi, lo], axis=0)  # [32, K_pad]
    return aux


def reg_stats(
    x, W, mu, A6, b3, pose, point_weights=None, top_k=None, outlier_logit=None,
    tile=DEFAULT_TILE, precision=DEFAULT_PRECISION, shift=None,
    coord_bound=None,
):
    """Pallas twin of em_ref.reg_stats. The pose (R, t) is applied IN-KERNEL
    (SMEM scalars), so the [8, N_pad] source buffer from prepare_points is
    reused untouched across every iteration of the registration scan.

    coord_bound: optional precomputed _coord_bound(pts_t) — registration
    scans pass it (via ops.Prepared) to skip the per-iteration N-wide max."""
    R, t = pose
    pts_t = prepare_points(x, point_weights, tile)
    n_pad = pts_t.shape[1]
    t_tile = min(tile, n_pad)
    if precision != "fast":
        shift = None
    else:
        if shift is None:
            shift = max_logit(W)  # fallback; see gaussians.max_logit_params
        if coord_bound is None:
            coord_bound = _coord_bound(pts_t)
        # Posed-coordinate bound: |(R x + t)_axis| <= ||x|| + ||t||
        # <= sqrt(3) * maxcoord(x) + ||t||. See em_stats.
        bound = 1.7320508 * coord_bound + jnp.linalg.norm(t)
        shift = shift + fast_logit_margin(W, bound)
    wt = prepare_mixture(W, precision=precision, shift=shift)
    sm = _softmax_scalars(outlier_logit, shift)
    k_pad = wt.shape[0]
    aux = _prepare_aux(mu, A6, b3, precision=precision)
    if aux.shape[1] != k_pad:
        aux = jnp.pad(aux, ((0, 0), (0, k_pad - aux.shape[1])))
    pose_flat = _salt_row(
        jnp.concatenate([R.reshape(-1), t.reshape(-1), jnp.zeros(4, _F32)])[
            None, :
        ].astype(_F32)
    )

    grid = (n_pad // t_tile,)
    fast = precision == "fast"
    horn_p, a_p, b_p, ll = pl.pallas_call(
        functools.partial(_reg_stats_kernel, top_k=top_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, t_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(pose_flat.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aux.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sm.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), _F32),
            jax.ShapeDtypeStruct((8, 128), _F32),
            jax.ShapeDtypeStruct((8, 128), _F32),
            jax.ShapeDtypeStruct((1, 1), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * k_pad * (80 if fast else 16) + 2 * 32 * k_pad + 200)
            * n_pad,
            bytes_accessed=n_pad * 36 + k_pad * 128,
            transcendentals=k_pad * n_pad,
        ),
        interpret=_interpret(),
    )(pts_t, pose_flat, wt, aux, sm)
    return RegStats(
        horn=horn_p[0:4, 0:4], A=a_p[0:6, 0:6], b=b_p[0:6, 0], loglik=ll[0, 0]
    )
