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


@functools.partial(jax.jit, static_argnames=("n_iters",))
def refine_pose_graph(
    R: jax.Array,  # [M, 3, 3] initial absolute poses
    t: jax.Array,  # [M, 3]
    edges: EdgeList,
    n_iters: int = 10,
    damping: float = 1e-6,
    gauge_weight: float = 1e8,
) -> PoseGraphResult:
    """Dense Gauss-Newton (single device; M up to a few hundred). Node 0 is
    gauge-fixed by a strong prior."""
    m = R.shape[0]

    def gn_step(carry, _):
        R, t = carry
        res, Ji, Jj = _res_and_jacs(
            R[edges.i], t[edges.i], R[edges.j], t[edges.j], edges.R, edges.t
        )  # [E,6], [E,6,6], [E,6,6]
        w = edges.weight[:, None, None]
        H = jnp.zeros((m, m, 6, 6), R.dtype)
        H = H.at[edges.i, edges.i].add(w * jnp.einsum("eai,eaj->eij", Ji, Ji))
        H = H.at[edges.j, edges.j].add(w * jnp.einsum("eai,eaj->eij", Jj, Jj))
        H = H.at[edges.i, edges.j].add(w * jnp.einsum("eai,eaj->eij", Ji, Jj))
        H = H.at[edges.j, edges.i].add(w * jnp.einsum("eai,eaj->eij", Jj, Ji))
        g = jnp.zeros((m, 6), R.dtype)
        g = g.at[edges.i].add(
            edges.weight[:, None] * jnp.einsum("eai,ea->ei", Ji, res)
        )
        g = g.at[edges.j].add(
            edges.weight[:, None] * jnp.einsum("eai,ea->ei", Jj, res)
        )
        # Gauge prior on node 0 + Levenberg damping.
        H = H.at[0, 0].add(gauge_weight * jnp.eye(6, dtype=R.dtype))
        Hd = H.transpose(0, 2, 1, 3).reshape(6 * m, 6 * m)
        Hd = Hd + damping * jnp.eye(6 * m, dtype=R.dtype)
        delta = -jnp.linalg.solve(Hd, g.reshape(6 * m)).reshape(m, 6)
        upd = jax.vmap(se3_exp)(delta)
        R_new = jnp.einsum("mij,mjk->mik", R, upd.R)
        t_new = t + jnp.einsum("mij,mj->mi", R, upd.t)
        cost = jnp.sum(edges.weight * jnp.sum(res * res, axis=1))
        return (R_new, t_new), cost

    (R_out, t_out), costs = jax.lax.scan(gn_step, (R, t), None, length=n_iters)
    return PoseGraphResult(R_out, t_out, costs)


# ---------------------------------------------------------------------------
# Distributed Schur complement for odometry chains
# ---------------------------------------------------------------------------

def refine_chain_sharded(
    R: jax.Array,
    t: jax.Array,
    edge_R: jax.Array,  # [M-1, 3, 3] measured relative rotations k -> k+1
    edge_t: jax.Array,  # [M-1, 3]
    mesh,
    n_iters: int = 10,
    damping: float = 1e-6,
    gauge_weight: float = 1e8,
) -> PoseGraphResult:
    """Distributed GN for an odometry chain via segment-wise Schur
    complement over collectives (BASELINE.json:5; SURVEY.md §2.2 row 3).

    The chain of M = S*L+1 nodes splits into S = n_devices segments of L
    edges. Each device owns its segment's INTERIOR nodes (the per-host
    "map" block) and shares boundary KEYFRAMES with its neighbors. Per GN
    iteration each device:
      1. builds its local block-tridiagonal normal equations
         (L+1 nodes: keyframe, L-1 interior, keyframe),
      2. eliminates the interior with a local dense solve — the Schur step,
      3. psums its reduced 12x12 keyframe contribution into the global
         (S+1)-keyframe system (the ONLY cross-device traffic, O(S^2)
         bytes),
      4. solves the tiny keyframe system (replicated) and back-substitutes
         its interior locally.
    Algebraically exact GN — matches refine_pose_graph up to damping
    placement and fp error (tests/test_pose_graph.py asserts this).
    """
    from jax.sharding import PartitionSpec as P

    from hgmm.parallel.mesh import POINTS_AXIS

    s = int(mesh.devices.size)
    m = R.shape[0]
    assert (m - 1) % s == 0, f"chain length {m} must be S*L+1 for S={s} devices"
    l_seg = (m - 1) // s
    assert l_seg >= 2, "need at least one interior node per segment"
    n_int = l_seg - 1
    dtype = R.dtype
    eye6 = jnp.eye(6, dtype=dtype)

    def to_segments(x):
        """[M, ...] node array -> [S, L+1, ...] overlapping segment stacks."""
        idx = jnp.arange(s)[:, None] * l_seg + jnp.arange(l_seg + 1)[None, :]
        return x[idx]

    def to_edge_segments(x):
        idx = jnp.arange(s)[:, None] * l_seg + jnp.arange(l_seg)[None, :]
        return x[idx]

    @functools.partial(jax.jit, static_argnames=())
    def run(R, t):
        def gn_step(carry, _):
            R_all, t_all = carry
            R_segs = to_segments(R_all)  # [S, L+1, 3, 3]
            t_segs = to_segments(t_all)
            zR_segs = to_edge_segments(edge_R)  # [S, L, 3, 3]
            zt_segs = to_edge_segments(edge_t)

            @functools.partial(
                jax.shard_map,
                mesh=mesh,
                check_vma=False,
                in_specs=(P(POINTS_AXIS), P(POINTS_AXIS), P(POINTS_AXIS),
                          P(POINTS_AXIS)),
                out_specs=(P(POINTS_AXIS), P(None), P()),
            )
            def seg_step(R_seg_s, t_seg_s, zR_s, zt_s):
                R_seg, t_seg = R_seg_s[0], t_seg_s[0]  # [L+1, ...]
                zR, zt = zR_s[0], zt_s[0]  # [L, ...]
                d = jax.lax.axis_index(POINTS_AXIS)

                # --- 1. local block-tridiagonal system over L+1 nodes.
                ii = jnp.arange(l_seg, dtype=jnp.int32)
                res, Ji, Jj = _res_and_jacs(
                    R_seg[ii], t_seg[ii], R_seg[ii + 1], t_seg[ii + 1], zR, zt
                )
                D = jnp.zeros((l_seg + 1, 6, 6), dtype)
                D = D.at[ii].add(jnp.einsum("eai,eaj->eij", Ji, Ji))
                D = D.at[ii + 1].add(jnp.einsum("eai,eaj->eij", Jj, Jj))
                U = jnp.einsum("eai,eaj->eij", Ji, Jj)  # block (k, k+1), [L,6,6]
                g = jnp.zeros((l_seg + 1, 6), dtype)
                g = g.at[ii].add(jnp.einsum("eai,ea->ei", Ji, res))
                g = g.at[ii + 1].add(jnp.einsum("eai,ea->ei", Jj, res))
                # Gauge prior on global node 0 (device 0's left keyframe).
                D = D.at[0].add(
                    jnp.where(d == 0, gauge_weight, 0.0) * eye6
                )
                D = D + damping * eye6  # Levenberg on every block

                # --- 2. Schur-eliminate interior nodes 1..L-1.
                # Dense interior matrix A_II [6*n_int, 6*n_int].
                A_II = jnp.zeros((n_int, n_int, 6, 6), dtype)
                A_II = A_II.at[jnp.arange(n_int), jnp.arange(n_int)].set(
                    D[1:l_seg]
                )
                if n_int > 1:
                    r_ = jnp.arange(n_int - 1)
                    A_II = A_II.at[r_, r_ + 1].set(U[1:l_seg - 1])
                    A_II = A_II.at[r_ + 1, r_].set(
                        jnp.swapaxes(U[1:l_seg - 1], -1, -2)
                    )
                A_II_d = A_II.transpose(0, 2, 1, 3).reshape(6 * n_int, 6 * n_int)
                # Interior <-> keyframe coupling: left kf couples to interior
                # node 1 via U[0]; right kf couples to interior L-1 via
                # U[L-1]^T.
                A_IK = jnp.zeros((n_int, 2, 6, 6), dtype)
                A_IK = A_IK.at[0, 0].set(jnp.swapaxes(U[0], -1, -2))
                A_IK = A_IK.at[n_int - 1, 1].set(U[l_seg - 1])
                A_IK_d = A_IK.transpose(0, 2, 1, 3).reshape(6 * n_int, 12)
                g_I = g[1:l_seg].reshape(6 * n_int)

                rhs = jnp.concatenate([A_IK_d, g_I[:, None]], axis=1)
                sol = jnp.linalg.solve(A_II_d, rhs)  # [6n_int, 13]
                X = sol[:, :12]  # A_II^-1 A_IK
                y = sol[:, 12]  # A_II^-1 g_I

                # Reduced keyframe system of this segment (2x2 of 6x6).
                A_KK = jnp.zeros((2, 2, 6, 6), dtype)
                A_KK = A_KK.at[0, 0].set(D[0])
                A_KK = A_KK.at[1, 1].set(D[l_seg])
                A_KK_d = A_KK.transpose(0, 2, 1, 3).reshape(12, 12)
                S_red = A_KK_d - A_IK_d.T @ X  # [12, 12]
                g_K = jnp.concatenate([g[0], g[l_seg]])  # [12]
                g_red = g_K - A_IK_d.T @ y

                # --- 3. psum into the global (S+1)-keyframe system.
                HK = jnp.zeros((s + 1, s + 1, 6, 6), dtype)
                blocks = S_red.reshape(2, 6, 2, 6).transpose(0, 2, 1, 3)
                kidx = jnp.stack([d, d + 1])
                HK = HK.at[kidx[:, None], kidx[None, :]].add(blocks)
                gK = jnp.zeros((s + 1, 6), dtype)
                gK = gK.at[kidx].add(g_red.reshape(2, 6))
                HK = jax.lax.psum(HK, POINTS_AXIS)
                gK = jax.lax.psum(gK, POINTS_AXIS)

                # --- 4. replicated keyframe solve + local back-substitution.
                HK_d = HK.transpose(0, 2, 1, 3).reshape(6 * (s + 1), 6 * (s + 1))
                HK_d = HK_d + damping * jnp.eye(6 * (s + 1), dtype=dtype)
                delta_K = -jnp.linalg.solve(HK_d, gK.reshape(-1))
                delta_K = delta_K.reshape(s + 1, 6)
                dk_local = jnp.concatenate([delta_K[d], delta_K[d + 1]])  # [12]
                delta_I = -(y + X @ dk_local).reshape(n_int, 6)

                delta_seg = jnp.concatenate(
                    [delta_K[d][None], delta_I, delta_K[d + 1][None]], axis=0
                )  # [L+1, 6]
                cost = jax.lax.psum(jnp.sum(res * res), POINTS_AXIS)
                return delta_seg[None], delta_K[s][None, :], cost

            delta_segs, _, cost = seg_step(R_segs, t_segs, zR_segs, zt_segs)
            # Stitch back: nodes [d*L, (d+1)*L) from segment d + final node.
            delta = jnp.concatenate(
                [delta_segs[:, :l_seg].reshape(m - 1, 6), delta_segs[-1, -1:][0][None]],
                axis=0,
            )  # [M, 6]
            upd = jax.vmap(se3_exp)(delta)
            R_new = jnp.einsum("mij,mjk->mik", R_all, upd.R)
            t_new = t_all + jnp.einsum("mij,mj->mi", R_all, upd.t)
            return (R_new, t_new), cost

        (R_out, t_out), costs = jax.lax.scan(gn_step, (R, t), None, length=n_iters)
        return R_out, t_out, costs

    R_out, t_out, costs = run(R, t)
    return PoseGraphResult(R_out, t_out, costs)
