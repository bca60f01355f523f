"""Registration / odometry quality metrics (SURVEY.md §1.2 Eval layer)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hgmm.models.se3 import Pose, se3_log, so3_log


def rmse(a: jax.Array, b: jax.Array) -> jax.Array:
    """Root-mean-square point-to-point distance of paired clouds [N,3]."""
    return jnp.sqrt(jnp.mean(jnp.sum((a - b) ** 2, axis=-1)))


def registration_rmse(pose: Pose, source: jax.Array, gt_pose: Pose) -> jax.Array:
    """RMSE between source transformed by the estimated vs. true pose."""
    return rmse(pose.apply(source), gt_pose.apply(source))


def rotation_error_deg(pose: Pose, gt_pose: Pose) -> jax.Array:
    """Geodesic rotation error in degrees."""
    dR = pose.R @ gt_pose.R.T
    ang = jnp.linalg.norm(so3_log(dR))
    return ang * 180.0 / jnp.pi


def translation_error(pose: Pose, gt_pose: Pose) -> jax.Array:
    return jnp.linalg.norm(pose.t - gt_pose.t)


def ate(est_poses: list[Pose] | tuple[Pose, ...], gt_poses) -> jax.Array:
    """Absolute trajectory error (RMSE of translation after no alignment —
    odometry frames share the origin). est/gt: sequences of absolute Pose."""
    est_t = jnp.stack([p.t for p in est_poses])
    gt_t = jnp.stack([p.t for p in gt_poses])
    return jnp.sqrt(jnp.mean(jnp.sum((est_t - gt_t) ** 2, axis=-1)))


def pose_delta_norm(a: Pose, b: Pose) -> jax.Array:
    """|| log(a b^-1) || — scalar pose discrepancy."""
    return jnp.linalg.norm(se3_log(a.compose(b.inverse())))
