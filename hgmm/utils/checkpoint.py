"""Checkpoint/resume of pipeline state (SURVEY.md §6.4): fitted mixtures,
per-frame poses and pose-graph state, at frame granularity, via plain
npz (no service dependencies; orbax unnecessary for KB-scale state)."""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from hgmm.models.se3 import Pose
from hgmm.ops.gaussians import MixtureParams


def save_odometry(
    path: str | Path, frame_idx: int, rel_poses, abs_poses, logliks=None
) -> None:
    np.savez(
        str(path),
        frame_idx=frame_idx,
        rel_R=np.stack([np.asarray(p.R) for p in rel_poses]) if rel_poses else np.zeros((0, 3, 3)),
        rel_t=np.stack([np.asarray(p.t) for p in rel_poses]) if rel_poses else np.zeros((0, 3)),
        abs_R=np.stack([np.asarray(p.R) for p in abs_poses]),
        abs_t=np.stack([np.asarray(p.t) for p in abs_poses]),
        # Per-pair final logliks: loop-closure acceptance compares candidate
        # quality against the chain median, so resumed runs must carry them
        # (NaN backfill silently disabled the gate — review round 4).
        logliks=np.asarray(
            logliks if logliks is not None else [], dtype=np.float64
        ),
    )


def load_odometry(path: str | Path):
    """Returns (frame_idx, rel_poses, abs_poses, logliks) or None."""
    path = Path(path)
    if not path.exists():
        return None
    z = np.load(str(path))
    rel = [Pose(jnp.asarray(R), jnp.asarray(t)) for R, t in zip(z["rel_R"], z["rel_t"])]
    ab = [Pose(jnp.asarray(R), jnp.asarray(t)) for R, t in zip(z["abs_R"], z["abs_t"])]
    lls = list(z["logliks"]) if "logliks" in z.files else []
    if len(lls) < len(rel):  # older checkpoints: pad honestly with NaN
        lls = lls + [float("nan")] * (len(rel) - len(lls))
    return int(z["frame_idx"]), rel, ab, lls


def save_mixture(path: str | Path, params: MixtureParams) -> None:
    np.savez(
        str(path),
        pi=np.asarray(params.pi),
        mu=np.asarray(params.mu),
        sigma=np.asarray(params.sigma),
    )


def load_mixture(path: str | Path) -> MixtureParams:
    z = np.load(str(path))
    return MixtureParams(
        jnp.asarray(z["pi"]), jnp.asarray(z["mu"]), jnp.asarray(z["sigma"])
    )


def save_tree(path: str | Path, tree) -> None:
    arrays = {"branch": np.asarray(tree.branch), "levels": np.asarray(len(tree.levels))}
    for i, lvl in enumerate(tree.levels):
        arrays[f"pi_{i}"] = np.asarray(lvl.pi)
        arrays[f"mu_{i}"] = np.asarray(lvl.mu)
        arrays[f"sigma_{i}"] = np.asarray(lvl.sigma)
    np.savez(str(path), **arrays)


def load_tree(path: str | Path):
    from hgmm.models.gmm_tree import GmmTree

    z = np.load(str(path))
    levels = tuple(
        MixtureParams(
            jnp.asarray(z[f"pi_{i}"]),
            jnp.asarray(z[f"mu_{i}"]),
            jnp.asarray(z[f"sigma_{i}"]),
        )
        for i in range(int(z["levels"]))
    )
    return GmmTree(levels=levels, branch=int(z["branch"]))
