"""Gaussian-mixture parameter packing: the quadratic-feature formulation.

This module is the mathematical heart of the TPU design (SURVEY.md §8 "hard
parts"; BASELINE.json:5 "tiled point x mixture log-likelihood matmul").

The per-point/per-component Gaussian log-density

    log [pi_j N(y; mu_j, Sigma_j)]
      = -1/2 [ y^T A_j y - 2 b_j . y + c_j ],     A_j = Sigma_j^{-1},
        b_j = A_j mu_j,
        c_j = mu_j^T b_j + logdet Sigma_j + 3 log 2pi - 2 log pi_j

is LINEAR in the degree-<=2 monomial features of y:

    psi(y) = [x^2, y^2, z^2, xy, xz, yz, x, y, z, 1]        (10 features)

so a whole [N, K] log-likelihood table is ONE matmul  -1/2 * Psi @ W  with
Psi = psi(points) [N, 10] and W [10, K] packed from mixture parameters.
Dually, the EM M-step sufficient statistics are EXACTLY

    S = Gamma^T @ Psi  in [K, 10]:
        S[:, 9]   = T0 = sum_i gamma_ij               (weights)
        S[:, 6:9] = T1 = sum_i gamma_ij y_i           (first moments)
        S[:, 0:6] = T2 = sum_i gamma_ij y_i y_i^T     (second moments, sym)

so the E-step AND the M-step reduction are both MXU matmuls sharing one
feature matrix — the design the Pallas kernels in hgmm.ops.fused_em fuse so
the [N, K] responsibility matrix never materializes in HBM.

The reference's CUDA E-step kernel + segmented-reduction M-step (SURVEY.md
§2.1 items 9-10) correspond to these two contractions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PHI_DIM = 10  # [x^2, y^2, z^2, xy, xz, yz, x, y, z, 1]
PHI_PAD = 16  # padded feature width: multiple of 8 sublanes, MXU-friendly

LOG_2PI = 1.8378770664093453

# Index maps between the 6 packed symmetric entries and [3,3] matrices.
# numpy (not jnp) so importing this module never initializes a JAX backend —
# required by jax.distributed.initialize in multi-process programs
# (tests/_mp_worker.py).
import numpy as _np  # noqa: E402

_SYM_I = _np.array([0, 1, 2, 0, 0, 1])
_SYM_J = _np.array([0, 1, 2, 1, 2, 2])


class MixtureParams(NamedTuple):
    """Plain GMM parameters. K components in R^3.

    weights may be unnormalized in intermediate states; log-space where noted.
    """

    pi: jax.Array  # [K] mixture weights (sum to 1 over active components)
    mu: jax.Array  # [K, 3] means
    sigma: jax.Array  # [K, 3, 3] covariances (SPD)

    @property
    def k(self) -> int:
        return self.pi.shape[0]


def features(points: jax.Array, pad: int | None = None) -> jax.Array:
    """psi(y): degree-<=2 monomial features. points [N, 3] -> [N, pad or 10].

    When `pad` is given the trailing columns are zero — safe to matmul against
    a zero-padded W.
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    ones = jnp.ones_like(x)
    phi = jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z, x, y, z, ones], axis=-1)
    if pad is not None and pad > PHI_DIM:
        phi = jnp.pad(phi, ((0, 0), (0, pad - PHI_DIM)))
    return phi


def sym_pack(m: jax.Array) -> jax.Array:
    """[..., 3, 3] symmetric -> [..., 6] packed [m00,m11,m22,m01,m02,m12]."""
    return m[..., _SYM_I, _SYM_J]


def sym_unpack(p: jax.Array) -> jax.Array:
    """[..., 6] packed -> [..., 3, 3] symmetric."""
    out = jnp.zeros(p.shape[:-1] + (3, 3), dtype=p.dtype)
    out = out.at[..., _SYM_I, _SYM_J].set(p)
    return out.at[..., _SYM_J, _SYM_I].set(p)


def _inv_and_logdet_3x3(sigma: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Closed-form Cholesky-based inverse + logdet for batched SPD [K, 3, 3].

    Cofactor expansion cancels catastrophically in fp32 for ill-conditioned
    covariances (eigenvalues at the regularization floor give det ~ 1e-14 —
    well below fp32 cancellation noise), so we factor Sigma = L L^T with the
    explicit 3x3 recurrence, invert L, and form Sigma^-1 = L^-T L^-1.
    logdet = 2 sum log diag(L). No LAPACK — fusable on TPU, differentiable.
    """
    tiny = jnp.asarray(1e-30, dtype=sigma.dtype)
    a, b, c = sigma[..., 0, 0], sigma[..., 1, 0], sigma[..., 2, 0]
    d, e = sigma[..., 1, 1], sigma[..., 2, 1]
    f = sigma[..., 2, 2]
    l11 = jnp.sqrt(jnp.maximum(a, tiny))
    l21 = b / l11
    l31 = c / l11
    l22 = jnp.sqrt(jnp.maximum(d - l21 * l21, tiny))
    l32 = (e - l21 * l31) / l22
    l33 = jnp.sqrt(jnp.maximum(f - l31 * l31 - l32 * l32, tiny))
    # M = L^-1 (lower triangular).
    m11 = 1.0 / l11
    m22 = 1.0 / l22
    m33 = 1.0 / l33
    m21 = -l21 * m11 * m22
    m31 = (l21 * l32 - l31 * l22) * m11 * m22 * m33
    m32 = -l32 * m22 * m33
    # Sigma^-1 = M^T M (symmetric).
    i00 = m11 * m11 + m21 * m21 + m31 * m31
    i01 = m21 * m22 + m31 * m32
    i02 = m31 * m33
    i11 = m22 * m22 + m32 * m32
    i12 = m32 * m33
    i22 = m33 * m33
    inv = jnp.stack(
        [
            jnp.stack([i00, i01, i02], axis=-1),
            jnp.stack([i01, i11, i12], axis=-1),
            jnp.stack([i02, i12, i22], axis=-1),
        ],
        axis=-2,
    )
    logdet = 2.0 * (jnp.log(l11) + jnp.log(l22) + jnp.log(l33))
    return inv, logdet


def precision_terms(params: MixtureParams) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-component (A, b, c) of the quadratic form (see module docstring).

    A: [K, 3, 3] precision; b: [K, 3] = A mu; c: [K] constant incl. -2 log pi.
    Components with pi == 0 get c = +inf (log-weight -inf) so they never win.
    """
    A, logdet = _inv_and_logdet_3x3(params.sigma)
    # Elementwise contractions, NOT einsum: on TPU, einsum lowers to
    # dot_general at DEFAULT precision (bf16 operands), and with collapsed
    # covariances (A entries ~1/cov_reg) the ~2^-8 relative rounding is
    # thousands of nats of absolute logit error — enough to break the
    # global-shift softmax bound and overflow exp2 (observed on-chip as a
    # level-2 tree-fit inf/NaN collapse). These are [K,3,3]-sized, so the
    # VPU does them exactly in f32 for free.
    b = jnp.sum(A * params.mu[:, None, :], axis=-1)
    # Finite floor (not -inf): keeps 0*inf NaNs out of the feature matmul
    # while still pushing pi=0 components below the NEG_INF mask threshold.
    log_pi = jnp.where(params.pi > 0, jnp.log(jnp.maximum(params.pi, 1e-38)), -1e30)
    c = jnp.sum(params.mu * b, axis=-1) + logdet + 3.0 * LOG_2PI - 2.0 * log_pi
    return A, b, c


def pack_loglik_weights(params: MixtureParams, pad: int | None = None) -> jax.Array:
    """Pack (A, b, c) into W [10 (or pad), K] with
    log[pi_j N(y; mu_j, Sigma_j)] = -1/2 * psi(y) @ W[:, j].

    Cross-term rows carry the factor 2 (features are pure monomials).
    """
    A, b, c = precision_terms(params)
    a6 = sym_pack(A)  # [K, 6]
    rows = [
        a6[:, 0],
        a6[:, 1],
        a6[:, 2],
        2.0 * a6[:, 3],
        2.0 * a6[:, 4],
        2.0 * a6[:, 5],
        -2.0 * b[:, 0],
        -2.0 * b[:, 1],
        -2.0 * b[:, 2],
        c,
    ]
    W = jnp.stack(rows, axis=0)  # [10, K]
    if pad is not None and pad > PHI_DIM:
        W = jnp.pad(W, ((0, pad - PHI_DIM), (0, 0)))
    return W


def max_logit_params(params: MixtureParams) -> jax.Array:
    """Exact, cancellation-free global logit upper bound from raw mixture
    parameters: max_j sup_y log[pi_j N(y)] = max_j log pi_j
    - 1/2 logdet Sigma_j - 3/2 log 2pi.

    THIS is the shift production code must fold into the fused kernels
    (ops.em_stats(..., shift=...)): recovering the same bound from the
    packed W (max_logit below) requires b^T A^-1 b, whose double 3x3
    inversion at condition number ~1/cov_reg carries eps*kappa relative
    error — observed on-chip as a ~1e5-nat bound violation that overflowed
    exp2 and killed whole tree levels. The direct formula has no
    cancellation at all.
    """
    _, logdet = _inv_and_logdet_3x3(params.sigma)
    log_pi = jnp.where(
        params.pi > 0, jnp.log(jnp.maximum(params.pi, 1e-38)), -1e30
    )
    g = log_pi - 0.5 * logdet - 1.5 * LOG_2PI
    # Floor keeps an all-dead mixture from dragging the shift to -1e30
    # (shifted dead logits would become +inf); see max_logit.
    return jnp.maximum(jnp.max(g) + 1e-3, -1e8)


def max_logit(W: jax.Array) -> jax.Array:
    """Scalar upper bound on log[pi_j N(y)] over ALL y and components.

    For each component the quadratic logit -1/2 (y^T A y - 2 b.y + c) peaks
    at y* = A^-1 b with value -1/2 (c - b^T A^-1 b) = log pi_j
    - 1/2 logdet Sigma_j - 3/2 log 2pi. The max over j is the global shift
    the fused kernels fold into the packed weights so the softmax runs
    WITHOUT a per-column max pass (hgmm.ops.fused_em "fast" path): shifted
    logits are <= ~0, so exp2 never overflows, and the shift being an upper
    bound (not the per-column max) only costs underflow range, documented
    there. O(K) trace-time math, hoisted out of EM scans by XLA.

    FALLBACK ONLY — accurate for well-conditioned mixtures (raw-W callers:
    tests, bench). The c - b^T A^-1 b cancellation loses eps * cond(A)
    relative accuracy, which for collapsed covariances (cond ~ 1/cov_reg)
    is catastrophic; production paths that iterate mixtures MUST pass
    shift=max_logit_params(params) into the ops instead.
    """
    A = sym_unpack(
        jnp.stack(
            [W[0], W[1], W[2], 0.5 * W[3], 0.5 * W[4], 0.5 * W[5]], axis=-1
        )
    )  # [K, 3, 3]
    b = -0.5 * W[6:9].T  # [K, 3]
    c = W[9]
    Ainv, _ = _inv_and_logdet_3x3(A)
    # Elementwise, not einsum: einsum would hit the MXU at bf16 DEFAULT
    # precision on TPU and G MUST be a true upper bound (see precision_terms).
    btAib = jnp.sum(b[:, :, None] * Ainv * b[:, None, :], axis=(1, 2))
    # f32 slack: c - btAib is a catastrophic cancellation for peaked
    # components (both terms ~ mu^T A mu >> result); pad G by the worst-case
    # cancellation error so it stays an UPPER bound. exp2 has ~127 octaves of
    # overflow headroom, so a few spare nats cost nothing.
    slack = 4e-7 * jnp.abs(btAib) + 1e-3
    # Floor: an all-dead mixture (every pi = 0, c ~ +2e30) would otherwise
    # yield G ~ -1e30 and push shifted logits to +inf; with the floor, dead
    # logits stay ~-1e30 below the shift and the E-step degrades gracefully
    # to zero stats / zero loglik instead of inf/NaN.
    return jnp.maximum(jnp.max(-0.5 * (c - btAib) + slack), -1e8)


def unpack_suffstats(S: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """S [K, >=10] = Gamma^T Psi  ->  (T0 [K], T1 [K,3], T2 [K,3,3])."""
    T0 = S[:, 9]
    T1 = S[:, 6:9]
    T2 = sym_unpack(S[:, 0:6])
    return T0, T1, T2


def sym3_eigvalsh(m: jax.Array) -> jax.Array:
    """Analytic ascending eigenvalues of symmetric [..., 3, 3] matrices
    (Smith's trigonometric method — the closed-form solution of the
    characteristic cubic).

    Replaces batched `jnp.linalg.eigh` on the M-step hot path: pure
    elementwise VPU math with clamped `acos`, so it is NaN-free for every
    finite input (XLA's iterative eigh on TPU is not guaranteed to converge
    cleanly for the clustered/degenerate eigenvalues that collapsed
    covariances produce) and fuses into the surrounding jit. f32 absolute
    accuracy is ~1e-4 * ||m|| worst-case (acos loses precision near
    clustered eigenvalues) — ample for floors (psd_floor compensates
    conservatively) and complexity scores.
    """
    q = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]) / 3.0
    a, d, f = m[..., 0, 0] - q, m[..., 1, 1] - q, m[..., 2, 2] - q
    b, c, e = m[..., 0, 1], m[..., 0, 2], m[..., 1, 2]
    p2 = a * a + d * d + f * f + 2.0 * (b * b + c * c + e * e)
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    # Normalize entries BEFORE the determinant (safe_p**3 underflows f32
    # for near-isotropic matrices; normalized entries are O(1)).
    safe_p = jnp.maximum(p, 1e-30)
    an, dn, fn = a / safe_p, d / safe_p, f / safe_p
    bn, cn, en = b / safe_p, c / safe_p, e / safe_p
    det = (
        an * (dn * fn - en * en)
        - bn * (bn * fn - en * cn)
        + cn * (bn * en - dn * cn)
    )
    r = jnp.clip(0.5 * det, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lmax = q + 2.0 * p * jnp.cos(phi)
    lmin = q + 2.0 * p * jnp.cos(phi + 2.0943951023931953)  # + 2 pi / 3
    lmid = 3.0 * q - lmax - lmin
    return jnp.stack([lmin, lmid, lmax], axis=-1)


def psd_floor(sigma: jax.Array, floor) -> jax.Array:
    """Floor the eigenvalues of symmetric [K, 3, 3] matrices at >= floor by
    adding the per-matrix eigenvalue deficit times I (eigenvectors are
    preserved exactly; eigenvalues above the floor shift up by the same
    deficit, which only matters for matrices that were degenerate anyway).

    Guards the M-step against non-PSD covariances from catastrophic
    cancellation in T2/T0 - mu mu^T for nearly-empty components (SURVEY.md §8
    "covariance PSD maintenance under eps-regularization"), and — with a
    scale-aware floor — against the covariance collapse that drives packed
    precisions beyond the fast kernels' bf16 accuracy domain.
    """
    sym = 0.5 * (sigma + jnp.swapaxes(sigma, -1, -2))
    lmin = sym3_eigvalsh(sym)[..., 0]
    # Conservative: sym3_eigvalsh may OVERestimate lmin by ~1e-4 * ||m||
    # for clustered eigenvalues; subtract that allowance so the floor is a
    # guarantee (the cost is an equally tiny extra bump).
    norm_bound = jnp.abs(
        sym[..., 0, 0] + sym[..., 1, 1] + sym[..., 2, 2]
    ) + jnp.sqrt(
        jnp.maximum(jnp.sum(sym * sym, axis=(-2, -1)), 0.0)
    )
    lmin = lmin - 2e-4 * norm_bound
    bump = jnp.maximum(jnp.asarray(floor, sym.dtype) - lmin, 0.0)
    return sym + bump[..., None, None] * jnp.eye(3, dtype=sym.dtype)


def fast_logit_margin(W: jax.Array, coord_bound) -> jax.Array:
    """Upper bound (nats) on the fused fast path's absolute logit error,
    to be ADDED to the global softmax shift before folding it into the
    packed weights.

    The fast kernels compute -1/2 psi(y)^T W on the MXU from hi/lo-bf16
    splits whose per-term relative error is ~2^-17 (phi side; the W side
    carries ~24 bits) plus f32 accumulation over the 80-deep contraction.
    The ABSOLUTE logit error therefore scales with the largest |terms|, not
    with the result: for collapsed covariances (|W| ~ 1/cov_reg) it reaches
    hundreds of octaves, violating the shift's upper-bound property and
    overflowing exp2 into inf/NaN (observed on-chip as a level-1 tree-fit
    collapse). Folding this bound into the shift makes exp2 overflow-proof
    for ANY finite mixture at zero hot-path cost: softmax responsibilities
    are shift-invariant and the lse correction is exact, so the only price
    is `margin` octaves of underflow range (out of ~126).

    coord_bound: bound on |coordinate| over points that carry nonzero
    weight (zero-weight padding may sit anywhere; its huge quadratic terms
    are sign-definite, so the relative error never flips their logits
    positive). 2^-15 = 0.5 (the -1/2 logit factor) * 2^-14 (per-term error
    bound with ~6x safety over the 2^-16.5 estimate).
    """
    B = jnp.asarray(coord_bound, jnp.float32)
    one = jnp.ones((), jnp.float32)
    psi_max = jnp.stack([B * B] * 6 + [B] * 3 + [one])  # [10]
    per_k = jnp.sum(jnp.abs(W[:PHI_DIM]) * psi_max[:, None], axis=0)  # [K]
    # DEAD components (pi == 0) carry c ~ +2e30 from the -1e30 log-weight
    # floor (precision_terms); their logits sit below every mask threshold
    # already and must not blow up the margin. Live components have
    # |c| <~ 1e8 (log pi >= log 1e-38, bounded logdet/quadratic), so the
    # c row cleanly separates the two.
    live = W[PHI_DIM - 1] < 1e28
    margin = jnp.max(jnp.where(live, per_k, 0.0))
    return (2.0 ** -15) * margin


def mstep_update(
    T0: jax.Array,
    T1: jax.Array,
    T2: jax.Array,
    total_weight: jax.Array | float,
    cov_reg: float = 1e-6,
    cov_type: str = "full",
    min_weight: float = 1e-6,
    cov_floor: jax.Array | float = 0.0,
) -> MixtureParams:
    """Closed-form M-step from sufficient statistics.

    pi_j = T0_j / total, mu_j = T1_j / T0_j,
    Sigma_j = T2_j / T0_j - mu_j mu_j^T + cov_reg * I.

    Empty components (T0 ~ 0) keep an identity-ish covariance and pi -> 0
    rather than producing NaNs (matches the robustness the reference needed
    from its segmented reductions; SURVEY.md §8 "covariance PSD maintenance").

    cov_floor: optional eigenvalue floor in data units^2 (on top of
    cov_reg). Fit entry points pass a SCALE-AWARE value (~1e-4 x scene
    variance) so covariance collapse on degenerate data saturates at a
    physically tiny scale instead of driving packed precisions to
    1/cov_reg magnitudes, where the fast kernels' bf16 logits lose all
    accuracy (see gaussians.fast_logit_margin). Pass 0 to disable.
    """
    dtype = T1.dtype
    # Empty floor is RELATIVE to the data mass: a component holding less
    # than ~1e-6 of the total weight is numerically meaningless — its
    # mu = T1/T0 amplifies kernel round-off into arbitrarily large garbage,
    # which then poisons the global softmax shift (gaussians.max_logit is a
    # max over components) and can kill an entire tree level (observed
    # on-chip). Zero it out: pi = 0 components are inert everywhere (their
    # packed logit sits below the mask floor).
    floor = jnp.maximum(jnp.asarray(min_weight, dtype), 1e-6 * total_weight)
    empty = T0 <= floor
    safe_T0 = jnp.maximum(T0, floor)
    pi = T0 / total_weight
    mu = jnp.where(empty[:, None], 0.0, T1 / safe_T0[:, None])
    sigma = T2 / safe_T0[:, None, None] - jnp.einsum("ki,kj->kij", mu, mu)
    if cov_type == "iso":
        var = jnp.trace(sigma, axis1=-2, axis2=-1) / 3.0
        sigma = var[:, None, None] * jnp.eye(3, dtype=dtype)
    elif cov_type == "diag":
        diag = jnp.diagonal(sigma, axis1=-2, axis2=-1)  # [K, 3]
        sigma = diag[..., None] * jnp.eye(3, dtype=dtype)
    sigma = sigma + cov_reg * jnp.eye(3, dtype=dtype)
    sigma = jnp.where(empty[:, None, None], jnp.eye(3, dtype=dtype), sigma)
    floor_eig = jnp.maximum(
        jnp.asarray(cov_floor, dtype), jnp.maximum(cov_reg, 1e-9)
    )
    sigma = psd_floor(sigma, floor_eig)
    pi = jnp.where(empty, 0.0, pi)
    return MixtureParams(pi=pi, mu=mu, sigma=sigma)
