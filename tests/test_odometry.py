import jax
import jax.numpy as jnp
import numpy as np

from hgmm.data.synthetic import make_cloud
from hgmm.eval.metrics import ate
from hgmm.models.se3 import Pose, so3_exp
from hgmm.pipelines.odometry import (
    OdometryConfig,
    refine_odometry,
    run_odometry,
)


def _make_sequence(n_frames=5, n_scene=4000, step_angle=0.06, step_t=0.05):
    """Scene viewed from a slowly moving sensor; frame k cloud is the scene
    expressed in frame k coordinates + noise + per-frame resampling."""
    scene = make_cloud(jax.random.PRNGKey(0), n_scene, kind="trefoil")
    gt = [Pose.identity()]
    for k in range(1, n_frames):
        step = Pose(
            so3_exp(jnp.array([0.0, 0.0, step_angle])),
            jnp.array([step_t, 0.0, 0.01]),
        )
        gt.append(gt[-1].compose(step))
    frames = []
    for k in range(n_frames):
        pts = gt[k].inverse().apply(scene)
        noise = 0.002 * jax.random.normal(jax.random.PRNGKey(100 + k), pts.shape)
        frames.append(np.asarray(pts + noise))
    return frames, gt


def test_odometry_recovers_trajectory():
    frames, gt = _make_sequence()
    cfg = OdometryConfig(
        model_kind="flat", k=32, fit_iters=15, reg_iters=30, bucket=2048,
        outlier_logit=None,
    )
    res = run_odometry(frames, cfg)
    assert len(res.abs_poses) == len(gt)
    err = float(ate(res.abs_poses, gt))
    assert err < 0.02, err


def test_odometry_checkpoint_resume(tmp_path):
    frames, gt = _make_sequence(n_frames=4)
    cfg = OdometryConfig(model_kind="flat", k=16, fit_iters=8, reg_iters=15, bucket=1024)
    ck = tmp_path / "odo.npz"
    full = run_odometry(frames, cfg, checkpoint_path=ck, checkpoint_every=1)
    # Simulate crash after frame 2: reload the checkpoint written there.
    from hgmm.utils import checkpoint as ckpt

    ckpt.save_odometry(ck, 2, full.rel_poses[:2], full.abs_poses[:3],
                       full.logliks[:2])
    resumed = run_odometry(frames, cfg, checkpoint_path=ck)
    assert len(resumed.abs_poses) == len(full.abs_poses)
    np.testing.assert_allclose(
        resumed.abs_poses[-1].t, full.abs_poses[-1].t, atol=1e-4
    )


def test_refine_odometry_runs():
    frames, gt = _make_sequence(n_frames=4)
    cfg = OdometryConfig(model_kind="flat", k=16, fit_iters=8, reg_iters=15, bucket=1024)
    res = run_odometry(frames, cfg)
    refined = refine_odometry(res, n_iters=5)
    assert refined.R.shape[0] == len(gt)
    assert bool(jnp.all(jnp.isfinite(refined.t)))


def test_sharded_odometry_respects_flat_model():
    """--model flat under a mesh must fit the flat K-GMM, not silently a
    tree (review finding: the sharded branch ignored model_kind)."""
    from hgmm.parallel import make_mesh

    frames, gt = _make_sequence(n_frames=3, n_scene=2000)
    cfg = OdometryConfig(
        model_kind="flat", k=16, fit_iters=8, reg_iters=12, bucket=1024,
        outlier_logit=None,
    )
    res = run_odometry(frames, cfg, mesh=make_mesh())
    from hgmm.eval.metrics import ate

    assert float(ate(res.abs_poses, gt)) < 0.05
