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


def kitti_gt_trajectory(cam_poses, calib_velo_to_cam: Pose) -> list[Pose]:
    """KITTI ground truth -> velodyne-frame trajectory comparable to odometry
    output (BASELINE.json:2,10 "KITTI pair ATE").

    cam_poses: list of P_k = T_{cam0 <- cam_k} from data.kitti.load_poses;
    calib_velo_to_cam: Tr = T_{cam <- velo} from load_calib_velo_to_cam.
    Returns T_{velo0 <- velo_k} = Tr^-1 P_0^-1 P_k Tr — absolute poses in the
    frame-0 velodyne frame, i.e. exactly what pipelines.odometry.run_odometry
    estimates (its frame 0 is the identity).
    """
    tr = calib_velo_to_cam
    tr_inv = tr.inverse()
    p0_inv = cam_poses[0].inverse()
    return [tr_inv.compose(p0_inv.compose(p).compose(tr)) for p in cam_poses]


def kitti_ate(est_poses, cam_poses, calib_velo_to_cam: Pose) -> jax.Array:
    """Absolute trajectory error of an odometry run against KITTI ground
    truth (poses.txt + calib.txt), in the velodyne frame."""
    gt = kitti_gt_trajectory(cam_poses, calib_velo_to_cam)
    return ate(est_poses, gt[: len(est_poses)])
