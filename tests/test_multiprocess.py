"""True multi-process distributed test (SURVEY.md §5.2, §2.3): launch N=2
local CPU processes under jax.distributed.initialize via
parallel.mesh.initialize_multihost, ingest per-process point slices with
parallel.mesh.shard_points_from_host, run sharded_em_fit +
sharded_register_points over the process-spanning mesh, and assert the
result matches the single-process oracle (psum of partials is exact up to
fp reassociation)."""

import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
WORKER = Path(__file__).with_name("_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_multiprocess_em_and_register(tmp_path):
    nproc = 2
    coord = f"127.0.0.1:{_free_port()}"
    out = tmp_path / "mp_result.npz"
    env = dict(os.environ)
    # Workers build their own CPU platform; strip the fake-device flag so
    # each process contributes its real local CPU device(s).
    env.pop("XLA_FLAGS", None)
    env["JAX_NUM_CPU_DEVICES"] = "2"  # 2 devices/process -> 4-device mesh
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, str(nproc), str(i), str(out)],
            env=env,
            cwd=str(REPO),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        outputs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outputs[i]}"
    assert out.exists(), outputs[0]
    got = np.load(out)

    # Single-process oracle: same data/init, plain (unsharded) EM.
    from hgmm.data.synthetic import make_cloud
    from hgmm.models.gmm import em_fit, init_params
    from hgmm.models.se3 import Pose, so3_exp
    from hgmm.pipelines.register import register_points
    from hgmm.ops.gaussians import MixtureParams

    pts = make_cloud(jax.random.PRNGKey(0), 512, kind="helix")
    init = init_params(pts, 8, jax.random.PRNGKey(1))
    params, lls = em_fit(pts, init, n_iters=5)
    np.testing.assert_allclose(got["lls"], np.asarray(lls), rtol=2e-4)
    np.testing.assert_allclose(got["pi"], np.asarray(params.pi), atol=2e-4)
    np.testing.assert_allclose(got["mu"], np.asarray(params.mu), atol=2e-3)

    # Registration recovered the known pose (and matches the single-process
    # register on the same fitted mixture).
    gt = Pose(so3_exp(jnp.array([0.0, 0.0, 0.2])), jnp.array([0.1, -0.05, 0.02]))
    np.testing.assert_allclose(got["gt_R"], np.asarray(gt.R), atol=1e-6)
    # Sanity only (8 blobs + 20 horn iters converge approximately); the
    # distributed-correctness assertion is the exact match below.
    np.testing.assert_allclose(got["R"], got["gt_R"], atol=0.1)
    np.testing.assert_allclose(got["t"], got["gt_t"], atol=0.1)

    mp_params = MixtureParams(
        jnp.asarray(got["pi"]), jnp.asarray(got["mu"]), jnp.asarray(got["sigma"])
    )
    src = gt.inverse().apply(pts)
    res = register_points(src, mp_params, n_iters=20, method="horn")
    np.testing.assert_allclose(got["R"], np.asarray(res.pose.R), atol=1e-4)
    np.testing.assert_allclose(got["t"], np.asarray(res.pose.t), atol=1e-4)

    # Distributed pose-graph (BASELINE.json:11 "psum EM + pose-graph
    # refinement over N>=2 hosts"): the 2-process sharded Schur solve with
    # a loop closure + robust kernel must match the single-process dense
    # solver on the exact edge set the workers used.
    from hgmm.pipelines.pose_graph import (
        EdgeList,
        concat_edge_lists,
        refine_pose_graph,
    )

    m = got["pg_R0"].shape[0]
    chain = EdgeList(
        i=jnp.arange(m - 1, dtype=jnp.int32),
        j=jnp.arange(1, m, dtype=jnp.int32),
        R=jnp.asarray(got["pg_relR"]),
        t=jnp.asarray(got["pg_relt"]),
        weight=jnp.ones((m - 1,), jnp.float32),
    )
    dense = refine_pose_graph(
        jnp.asarray(got["pg_R0"]), jnp.asarray(got["pg_t0"]),
        concat_edge_lists(
            chain,
            EdgeList(
                i=jnp.array([1], jnp.int32), j=jnp.array([m - 2], jnp.int32),
                R=jnp.asarray(got["pg_lcR"])[None],
                t=jnp.asarray(got["pg_lct"])[None],
                weight=jnp.array([5.0]),
            ),
        ),
        n_iters=6, damping=1e-8, robust_delta=5.0,
    )
    np.testing.assert_allclose(got["pg_t"], np.asarray(dense.t), atol=1e-3)
    np.testing.assert_allclose(got["pg_R"], np.asarray(dense.R), atol=1e-3)
