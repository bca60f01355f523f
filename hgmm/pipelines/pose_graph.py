"""Pose-graph optimization: Gauss-Newton on SE(3) with exact autodiff
Jacobians, plus a distributed Schur-complement solver for odometry chains
(BASELINE.json:5 "pose-graph/bundle-adjustment stage uses Schur-complement
reduction over collectives with keyframes/map blocks partitioned per
host"; papers: PAPERS.md 2209.02207, 1805.12279).

Parametrization: right-perturbation T_i <- T_i * Exp(xi_i). Edge residual
r_e = Log(Z_e^-1 * T_i^-1 * T_j) in R^6; per-edge 6x6 Jacobians come from
jax.jacfwd of the residual at xi = 0 — exact, no hand-derived adjoints to
get wrong, and still fully jittable (the graph is a fixed-size batch of
edges; SURVEY.md §3.6).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hgmm.models.se3 import Pose, se3_exp, se3_log


class EdgeList(NamedTuple):
    """Fixed-size batch of relative-pose constraints i -> j."""

    i: jax.Array  # [E] int32 source node
    j: jax.Array  # [E] int32 target node
    R: jax.Array  # [E, 3, 3] measured relative rotation (frame i -> j)
    t: jax.Array  # [E, 3] measured relative translation
    weight: jax.Array  # [E] scalar information weight


def odometry_chain_edges(rel_poses: list[Pose] | tuple[Pose, ...]) -> EdgeList:
    """Edges (k, k+1) from a list of frame-to-frame relative poses
    (Z_k = pose of frame k+1 expressed in frame k)."""
    e = len(rel_poses)
    return EdgeList(
        i=jnp.arange(e, dtype=jnp.int32),
        j=jnp.arange(1, e + 1, dtype=jnp.int32),
        R=jnp.stack([p.R for p in rel_poses]),
        t=jnp.stack([p.t for p in rel_poses]),
        weight=jnp.ones((e,), jnp.float32),
    )


def concat_edge_lists(a: EdgeList, b: EdgeList) -> EdgeList:
    return EdgeList(
        i=jnp.concatenate([a.i, b.i]),
        j=jnp.concatenate([a.j, b.j]),
        R=jnp.concatenate([a.R, b.R]),
        t=jnp.concatenate([a.t, b.t]),
        weight=jnp.concatenate([a.weight, b.weight]),
    )


def _edge_residual(xi_i, xi_j, Ti_R, Ti_t, Tj_R, Tj_t, Z_R, Z_t):
    Ti = Pose(Ti_R, Ti_t).compose(se3_exp(xi_i))
    Tj = Pose(Tj_R, Tj_t).compose(se3_exp(xi_j))
    Z = Pose(Z_R, Z_t)
    return se3_log(Z.inverse().compose(Ti.inverse().compose(Tj)))


_res_and_jacs = jax.vmap(
    lambda TiR, Tit, TjR, Tjt, ZR, Zt: (
        _edge_residual(jnp.zeros(6), jnp.zeros(6), TiR, Tit, TjR, Tjt, ZR, Zt),
        jax.jacfwd(_edge_residual, argnums=0)(
            jnp.zeros(6), jnp.zeros(6), TiR, Tit, TjR, Tjt, ZR, Zt
        ),
        jax.jacfwd(_edge_residual, argnums=1)(
            jnp.zeros(6), jnp.zeros(6), TiR, Tit, TjR, Tjt, ZR, Zt
        ),
    )
)


class PoseGraphResult(NamedTuple):
    R: jax.Array  # [M, 3, 3]
    t: jax.Array  # [M, 3]
    residual_history: jax.Array  # [n_iters] sum of squared residuals

    def poses(self) -> list[Pose]:
        return [Pose(self.R[m], self.t[m]) for m in range(self.R.shape[0])]


def _robust_weight(weight, res, robust_delta):
    """IRLS Geman-McClure reweighting: the edge weight is scaled by
    (delta^2 / (delta^2 + ||r||^2))^2 — ~1 for residuals below delta,
    ~(delta/||r||)^4 above it. The kernel is REDESCENDING: a false loop
    closure (gross outlier constraint) is effectively switched OFF rather
    than merely bounded (a Huber/linear penalty still exerts a constant
    weight*delta pull that measurably bends the whole graph — tested).
    None = pure GN."""
    if robust_delta is None:
        return weight
    r2 = jnp.sum(res * res, axis=1)
    d2 = robust_delta * robust_delta
    return weight * (d2 / (d2 + r2)) ** 2


def refine_pose_graph(
    R: jax.Array,  # [M, 3, 3] initial absolute poses
    t: jax.Array,  # [M, 3]
    edges: EdgeList,
    n_iters: int = 10,
    damping: float = 1e-6,
    gauge_weight: float = 1e8,
    robust_delta: float | None = None,
) -> PoseGraphResult:
    """Dense Gauss-Newton (single device; M up to a few hundred). Node 0 is
    gauge-fixed by a strong prior. robust_delta: see _robust_weight.

    Edge endpoints are validated eagerly when concrete: under jit an
    out-of-range gather CLAMPS, silently pinning a bad constraint to node
    M-1 (same contract as refine_chain_sharded's closure validation)."""
    import numpy as np

    m = int(R.shape[0])
    if not isinstance(edges.i, jax.core.Tracer):
        idx = np.concatenate([np.asarray(edges.i), np.asarray(edges.j)])
        bad = idx[(idx < 0) | (idx >= m)]
        if bad.size:
            raise ValueError(
                f"edge endpoints {sorted(set(bad.tolist()))} out of range "
                f"for {m} nodes"
            )
    return _refine_pose_graph_jit(
        R, t, edges, n_iters, damping, gauge_weight, robust_delta
    )


@functools.partial(
    jax.jit, static_argnames=("n_iters", "robust_delta")
)
def _refine_pose_graph_jit(
    R, t, edges, n_iters, damping, gauge_weight, robust_delta
) -> PoseGraphResult:
    m = R.shape[0]

    def gn_step(carry, _):
        R, t = carry
        res, Ji, Jj = _res_and_jacs(
            R[edges.i], t[edges.i], R[edges.j], t[edges.j], edges.R, edges.t
        )  # [E,6], [E,6,6], [E,6,6]
        w_r = _robust_weight(edges.weight, res, robust_delta)
        w = w_r[:, None, None]
        H = jnp.zeros((m, m, 6, 6), R.dtype)
        H = H.at[edges.i, edges.i].add(w * jnp.einsum("eai,eaj->eij", Ji, Ji))
        H = H.at[edges.j, edges.j].add(w * jnp.einsum("eai,eaj->eij", Jj, Jj))
        H = H.at[edges.i, edges.j].add(w * jnp.einsum("eai,eaj->eij", Ji, Jj))
        H = H.at[edges.j, edges.i].add(w * jnp.einsum("eai,eaj->eij", Jj, Ji))
        g = jnp.zeros((m, 6), R.dtype)
        g = g.at[edges.i].add(
            w_r[:, None] * jnp.einsum("eai,ea->ei", Ji, res)
        )
        g = g.at[edges.j].add(
            w_r[:, None] * jnp.einsum("eai,ea->ei", Jj, res)
        )
        # Gauge prior on node 0 + Levenberg damping.
        H = H.at[0, 0].add(gauge_weight * jnp.eye(6, dtype=R.dtype))
        Hd = H.transpose(0, 2, 1, 3).reshape(6 * m, 6 * m)
        Hd = Hd + damping * jnp.eye(6 * m, dtype=R.dtype)
        delta = -jnp.linalg.solve(Hd, g.reshape(6 * m)).reshape(m, 6)
        upd = jax.vmap(se3_exp)(delta)
        R_new = jnp.einsum("mij,mjk->mik", R, upd.R)
        t_new = t + jnp.einsum("mij,mj->mi", R, upd.t)
        cost = jnp.sum(w_r * jnp.sum(res * res, axis=1))
        return (R_new, t_new), cost

    (R_out, t_out), costs = jax.lax.scan(gn_step, (R, t), None, length=n_iters)
    return PoseGraphResult(R_out, t_out, costs)


# ---------------------------------------------------------------------------
# Distributed Schur complement for odometry chains
# ---------------------------------------------------------------------------

def _chain_segmentation(m: int, s: int, closure_nodes):
    """Host-side static segmentation of an M-node chain over S devices.

    Returns None when the chain cannot be sharded (too short, or closure
    endpoints would need more than S+1 keyframes), else a dict of numpy
    index arrays:
      bounds [S+1]      global node ids of the keyframes (ascending; every
                        closure endpoint is a keyframe)
      node_idx [S, L+1] slot -> global node id per segment (unused slots
                        alias the left keyframe so pose gathers stay valid)
      pi, pj [S, L]     local slot endpoints of each edge slot
      eidx [S, L]       global chain-edge id of each edge slot (0 for pads)
      emask [S, L]      True where the edge slot carries a real chain edge
      int_scatter [S, L-1] global node id of interior slot 1..L-1, or M
                        (a dump row) for unused slots
    """
    import numpy as np

    required = {0, m - 1} | {int(x) for x in closure_nodes}
    if m - 1 < s or len(required) > s + 1 or any(
        x < 0 or x >= m for x in required
    ):
        return None
    bounds = sorted(required)
    while len(bounds) < s + 1:
        # Split the largest inter-keyframe gap until every device has a
        # segment. Gaps of 1 edge cannot split; with m-1 >= s and
        # len(required) <= s+1 distinct nodes always remain.
        g, d = max((bounds[d + 1] - bounds[d], d) for d in range(len(bounds) - 1))
        if g < 2:
            return None
        bounds.insert(d + 1, bounds[d] + g // 2)
    bounds = np.asarray(bounds, np.int32)
    seg_len = bounds[1:] - bounds[:-1]  # [S] real edges per segment
    l_seg = max(2, int(seg_len.max()))
    node_idx = np.zeros((s, l_seg + 1), np.int32)
    pi = np.zeros((s, l_seg), np.int32)
    pj = np.zeros((s, l_seg), np.int32)
    eidx = np.zeros((s, l_seg), np.int32)
    emask = np.zeros((s, l_seg), bool)
    int_scatter = np.full((s, l_seg - 1), m, np.int32)
    for d in range(s):
        b0, b1 = int(bounds[d]), int(bounds[d + 1])
        ld = b1 - b0
        # Slots 0..ld-1 walk the real path from the left keyframe; slot
        # l_seg is the right keyframe; slots ld..l_seg-1 are unused (alias
        # b0 so residual evaluation stays finite — their edges get weight
        # 0, so they contribute nothing: the reduction is EXACT, not a
        # stiff-penalty approximation).
        node_idx[d, :ld] = b0 + np.arange(ld)
        node_idx[d, ld:l_seg] = b0
        node_idx[d, l_seg] = b1
        pi[d, :ld] = np.arange(ld)
        pj[d, : ld - 1] = np.arange(1, ld)
        pj[d, ld - 1] = l_seg  # last real edge couples into the right kf
        eidx[d, :ld] = b0 + np.arange(ld)
        emask[d, :ld] = True
        int_scatter[d, : ld - 1] = b0 + np.arange(1, ld)
    return dict(
        bounds=bounds, node_idx=node_idx, pi=pi, pj=pj, eidx=eidx,
        emask=emask, int_scatter=int_scatter, l_seg=l_seg,
    )


def refine_chain_sharded(
    R: jax.Array,
    t: jax.Array,
    edge_R: jax.Array,  # [M-1, 3, 3] measured relative rotations k -> k+1
    edge_t: jax.Array,  # [M-1, 3]
    mesh,
    n_iters: int = 10,
    damping: float = 1e-6,
    gauge_weight: float = 1e8,
    edge_weight: jax.Array | None = None,  # [M-1] chain-edge weights
    closures: EdgeList | None = None,  # loop closures (concrete node ids)
    robust_delta: float | None = None,  # IRLS robust gate (see _robust_weight)
) -> PoseGraphResult:
    """Distributed GN for an odometry chain via segment-wise Schur
    complement over collectives (BASELINE.json:5; SURVEY.md §2.2 row 3).

    The chain of M nodes splits into S = n_devices segments whose
    boundaries are the KEYFRAMES: node 0, node M-1, every loop-closure
    endpoint, and enough evenly-split fill boundaries to give each device
    one segment. Segments are padded to a common slot count L with
    weight-0 edges on aliased slots, so arbitrary chain lengths reduce
    EXACTLY (no stiff-penalty approximation). Per GN iteration each device:
      1. builds its local segment normal equations over L+1 slots,
      2. eliminates the interior slots with a local dense solve (Schur),
      3. psums its reduced 12x12 keyframe contribution into the global
         (S+1)-keyframe system — the ONLY cross-device traffic, O(S^2)
         bytes,
      4. solves the tiny keyframe system (replicated, with the closure
         blocks added — closures connect keyframes by construction, so
         they cost zero extra collective traffic) and back-substitutes its
         interior locally.
    Matches refine_pose_graph up to damping placement and fp error
    (tests/test_pose_graph.py asserts this, with and without closures).

    Falls back to the dense solver when the chain is too short to shard
    (M-1 < n_devices) or distinct closure endpoints exceed S+1 keyframes —
    both regimes are small enough that the dense solve is the right tool.

    closures: endpoints must be CONCRETE (host) values — they determine
    the static keyframe placement.
    """
    import numpy as np

    from jax.sharding import PartitionSpec as P

    from hgmm.parallel.mesh import POINTS_AXIS

    s = int(mesh.devices.size)
    m = int(R.shape[0])
    dtype = R.dtype
    if edge_weight is None:
        edge_weight = jnp.ones((m - 1,), dtype)

    closure_nodes = ()
    if closures is not None and int(np.asarray(closures.i).shape[0]) > 0:
        closure_nodes = [int(x) for x in np.asarray(closures.i)] + [
            int(x) for x in np.asarray(closures.j)
        ]
        # Validate eagerly: under jit an out-of-range gather index CLAMPS
        # (a closure at node m would silently pin node m-1) — raise, don't
        # fall through to a quietly-corrupted dense solve.
        bad = [x for x in closure_nodes if x < 0 or x >= m]
        if bad:
            raise ValueError(
                f"closure endpoints {bad} out of range for {m} nodes"
            )
    else:
        closures = None

    seg = _chain_segmentation(m, s, closure_nodes)
    if seg is None:
        if m > 512:
            # The dense solver materializes an [M, M, 6, 6] Hessian — at
            # KITTI scale that is a silent OOM/stall, not a fallback. The
            # usual cause is more closure endpoints than the S+1 keyframe
            # budget (detect_loop_closures caps itself when given a mesh).
            import warnings

            warnings.warn(
                f"refine_chain_sharded: cannot shard {m}-node chain "
                f"({len(set(closure_nodes))} closure endpoints vs "
                f"{s + 1}-keyframe budget); falling back to the DENSE "
                f"O(M^3) solver — expect high memory/time at this scale",
                stacklevel=2,
            )
        edges = EdgeList(
            i=jnp.arange(m - 1, dtype=jnp.int32),
            j=jnp.arange(1, m, dtype=jnp.int32),
            R=edge_R, t=edge_t, weight=edge_weight,
        )
        if closures is not None:
            edges = concat_edge_lists(edges, closures)
        return refine_pose_graph(
            R, t, edges, n_iters=n_iters, damping=damping,
            gauge_weight=gauge_weight, robust_delta=robust_delta,
        )

    l_seg = seg["l_seg"]
    n_int = l_seg - 1
    eye6 = jnp.eye(6, dtype=dtype)
    node_idx = jnp.asarray(seg["node_idx"])  # [S, L+1]
    pi_segs = jnp.asarray(seg["pi"])  # [S, L]
    pj_segs = jnp.asarray(seg["pj"])
    bounds = jnp.asarray(seg["bounds"])  # [S+1]
    int_scatter = jnp.asarray(seg["int_scatter"]).reshape(-1)  # [S*(L-1)]
    emask = jnp.asarray(seg["emask"])
    eidx = jnp.asarray(seg["eidx"])
    # Per-slot edge measurements/weights; pad slots carry identity Z and
    # weight 0 (inert).
    zR_segs = jnp.where(
        emask[..., None, None], edge_R[eidx], jnp.eye(3, dtype=dtype)
    )  # [S, L, 3, 3]
    zt_segs = jnp.where(emask[..., None], edge_t[eidx], 0.0)
    w_segs = jnp.where(emask, edge_weight[eidx], 0.0).astype(dtype)
    kf_slots = jnp.array([0, l_seg], jnp.int32)

    if closures is not None:
        kf_of = {int(n): k for k, n in enumerate(seg["bounds"])}
        cl_ki = jnp.asarray(
            [kf_of[int(x)] for x in np.asarray(closures.i)], jnp.int32
        )
        cl_kj = jnp.asarray(
            [kf_of[int(x)] for x in np.asarray(closures.j)], jnp.int32
        )

    def closure_blocks(R_all, t_all):
        """GN blocks of the closure edges on the (S+1)-keyframe system,
        computed replicated (O(C) tiny work per device)."""
        HK = jnp.zeros((s + 1, s + 1, 6, 6), dtype)
        gK = jnp.zeros((s + 1, 6), dtype)
        if closures is None:
            return HK, gK, jnp.zeros((), dtype)
        res, Ji, Jj = _res_and_jacs(
            R_all[closures.i], t_all[closures.i],
            R_all[closures.j], t_all[closures.j],
            closures.R, closures.t,
        )
        w_r = _robust_weight(closures.weight, res, robust_delta)
        w = w_r[:, None, None]
        HK = HK.at[cl_ki, cl_ki].add(w * jnp.einsum("eai,eaj->eij", Ji, Ji))
        HK = HK.at[cl_kj, cl_kj].add(w * jnp.einsum("eai,eaj->eij", Jj, Jj))
        HK = HK.at[cl_ki, cl_kj].add(w * jnp.einsum("eai,eaj->eij", Ji, Jj))
        HK = HK.at[cl_kj, cl_ki].add(w * jnp.einsum("eai,eaj->eij", Jj, Ji))
        gK = gK.at[cl_ki].add(
            w_r[:, None] * jnp.einsum("eai,ea->ei", Ji, res)
        )
        gK = gK.at[cl_kj].add(
            w_r[:, None] * jnp.einsum("eai,ea->ei", Jj, res)
        )
        cost = jnp.sum(w_r * jnp.sum(res * res, axis=1))
        return HK, gK, cost

    @jax.jit
    def run(R, t):
        def gn_step(carry, _):
            R_all, t_all = carry
            R_segs = R_all[node_idx]  # [S, L+1, 3, 3]
            t_segs = t_all[node_idx]
            HK_cl, gK_cl, cost_cl = closure_blocks(R_all, t_all)

            @functools.partial(
                jax.shard_map,
                mesh=mesh,
                # Pure-jnp body (no Pallas) — keep the vma audit on.
                check_vma=True,
                in_specs=(P(POINTS_AXIS),) * 7 + (P(), P()),
                out_specs=(P(POINTS_AXIS), P(None), P()),
            )
            def seg_step(R_seg_s, t_seg_s, zR_s, zt_s, w_s, pi_s, pj_s,
                         HK_cl, gK_cl):
                R_seg, t_seg = R_seg_s[0], t_seg_s[0]  # [L+1, ...]
                zR, zt, w = zR_s[0], zt_s[0], w_s[0]  # [L, ...]
                pi, pj = pi_s[0], pj_s[0]  # [L]
                d = jax.lax.axis_index(POINTS_AXIS)

                # --- 1. local normal equations over L+1 slots (scatter by
                # the static slot-endpoint arrays; weight-0 pad edges are
                # inert so the padded system is EXACTLY the real one plus
                # damping-only unused slots).
                res, Ji, Jj = _res_and_jacs(
                    R_seg[pi], t_seg[pi], R_seg[pj], t_seg[pj], zR, zt
                )
                w = _robust_weight(w, res, robust_delta)
                wJ = w[:, None, None]
                A = jnp.zeros((l_seg + 1, l_seg + 1, 6, 6), dtype)
                A = A.at[pi, pi].add(wJ * jnp.einsum("eai,eaj->eij", Ji, Ji))
                A = A.at[pj, pj].add(wJ * jnp.einsum("eai,eaj->eij", Jj, Jj))
                A = A.at[pi, pj].add(wJ * jnp.einsum("eai,eaj->eij", Ji, Jj))
                A = A.at[pj, pi].add(wJ * jnp.einsum("eai,eaj->eij", Jj, Ji))
                g = jnp.zeros((l_seg + 1, 6), dtype)
                g = g.at[pi].add(w[:, None] * jnp.einsum("eai,ea->ei", Ji, res))
                g = g.at[pj].add(w[:, None] * jnp.einsum("eai,ea->ei", Jj, res))
                # Gauge prior on global node 0 (device 0's left keyframe)
                # + Levenberg damping on every slot.
                A = A.at[0, 0].add(jnp.where(d == 0, gauge_weight, 0.0) * eye6)
                diag = jnp.arange(l_seg + 1)
                A = A.at[diag, diag].add(damping * eye6)

                # --- 2. Schur-eliminate interior slots 1..L-1.
                A_II_d = (
                    A[1:l_seg, 1:l_seg]
                    .transpose(0, 2, 1, 3)
                    .reshape(6 * n_int, 6 * n_int)
                )
                A_IK_d = (
                    A[1:l_seg, kf_slots]
                    .transpose(0, 2, 1, 3)
                    .reshape(6 * n_int, 12)
                )
                g_I = g[1:l_seg].reshape(6 * n_int)
                rhs = jnp.concatenate([A_IK_d, g_I[:, None]], axis=1)
                sol = jnp.linalg.solve(A_II_d, rhs)  # [6n_int, 13]
                X = sol[:, :12]  # A_II^-1 A_IK
                y = sol[:, 12]  # A_II^-1 g_I

                A_KK_d = (
                    A[kf_slots][:, kf_slots]
                    .transpose(0, 2, 1, 3)
                    .reshape(12, 12)
                )
                S_red = A_KK_d - A_IK_d.T @ X  # [12, 12]
                g_red = jnp.concatenate([g[0], g[l_seg]]) - A_IK_d.T @ y

                # --- 3. psum into the global (S+1)-keyframe system; the
                # replicated closure blocks join AFTER the psum (added once).
                HK = jnp.zeros((s + 1, s + 1, 6, 6), dtype)
                blocks = S_red.reshape(2, 6, 2, 6).transpose(0, 2, 1, 3)
                kidx = jnp.stack([d, d + 1])
                HK = HK.at[kidx[:, None], kidx[None, :]].add(blocks)
                gK = jnp.zeros((s + 1, 6), dtype)
                gK = gK.at[kidx].add(g_red.reshape(2, 6))
                HK = jax.lax.psum(HK, POINTS_AXIS) + HK_cl
                gK = jax.lax.psum(gK, POINTS_AXIS) + gK_cl

                # --- 4. replicated keyframe solve + local back-substitution.
                HK_d = HK.transpose(0, 2, 1, 3).reshape(6 * (s + 1), 6 * (s + 1))
                HK_d = HK_d + damping * jnp.eye(6 * (s + 1), dtype=dtype)
                delta_K = -jnp.linalg.solve(HK_d, gK.reshape(-1))
                delta_K = delta_K.reshape(s + 1, 6)
                dk_local = jnp.concatenate([delta_K[d], delta_K[d + 1]])  # [12]
                delta_I = -(y + X @ dk_local).reshape(n_int, 6)

                cost = jax.lax.psum(jnp.sum(w * jnp.sum(res * res, 1)),
                                    POINTS_AXIS)
                return delta_I[None], delta_K, cost

            delta_int, delta_K, cost = seg_step(
                R_segs, t_segs, zR_segs, zt_segs, w_segs, pi_segs, pj_segs,
                HK_cl, gK_cl,
            )
            # Stitch: keyframe deltas land at the boundary nodes, interior
            # deltas scatter to their global nodes (unused slots hit the
            # dump row m, discarded below).
            delta = jnp.zeros((m + 1, 6), dtype)
            delta = delta.at[bounds].set(delta_K)
            delta = delta.at[int_scatter].set(
                delta_int.reshape(s * n_int, 6)
            )[:m]
            upd = jax.vmap(se3_exp)(delta)
            R_new = jnp.einsum("mij,mjk->mik", R_all, upd.R)
            t_new = t_all + jnp.einsum("mij,mj->mi", R_all, upd.t)
            return (R_new, t_new), cost + cost_cl

        (R_out, t_out), costs = jax.lax.scan(gn_step, (R, t), None, length=n_iters)
        return R_out, t_out, costs

    R_out, t_out, costs = run(R, t)
    return PoseGraphResult(R_out, t_out, costs)
