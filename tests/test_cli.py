import jax
import numpy as np

from hgmm.cli.main import main
from hgmm.data.ply import save_ply
from hgmm.data.synthetic import make_cloud
from hgmm.models.se3 import random_pose


def test_cli_register_and_fit(tmp_path, capsys):
    cloud = make_cloud(jax.random.PRNGKey(0), 1200, kind="trefoil")
    gt = random_pose(jax.random.PRNGKey(1), max_angle=0.1, max_trans=0.03)
    source = np.asarray(gt.inverse().apply(cloud))
    tgt_p = tmp_path / "target.ply"
    src_p = tmp_path / "source.ply"
    save_ply(tgt_p, np.asarray(cloud))
    save_ply(src_p, source)

    out_p = tmp_path / "T.npy"
    aligned_p = tmp_path / "aligned.ply"
    main([
        "register", str(src_p), str(tgt_p), "--preset", "config1_flat64",
        "--out", str(out_p), "--export-aligned", str(aligned_p),
    ])
    T = np.load(out_p)
    np.testing.assert_allclose(T[:3, :3], np.asarray(gt.R), atol=0.05)
    assert aligned_p.exists()

    mix_p = tmp_path / "mix.npz"
    main(["fit-gmm", str(tgt_p), "--out", str(mix_p), "--k", "8", "--iters", "5"])
    from hgmm.utils.checkpoint import load_mixture, load_tree

    params = load_mixture(mix_p)
    assert params.pi.shape == (8,)

    # Tree fit saves and reloads (checkpoint roundtrip, SURVEY.md §6.4).
    tree_p = tmp_path / "tree.npz"
    main([
        "fit-gmm", str(tgt_p), "--tree", "--out", str(tree_p),
        "--branch", "4", "--levels", "2", "--iters", "4",
    ])
    tree = load_tree(tree_p)
    assert tree.branch == 4 and tree.n_leaves == 16
    assert np.asarray(tree.levels[1].pi).shape == (16,)


def test_cli_icp(tmp_path, capsys):
    cloud = make_cloud(jax.random.PRNGKey(2), 800, kind="helix")
    gt = random_pose(jax.random.PRNGKey(3), max_angle=0.05, max_trans=0.02)
    source = np.asarray(gt.inverse().apply(cloud))
    tgt_p = tmp_path / "t.ply"
    src_p = tmp_path / "s.ply"
    save_ply(tgt_p, np.asarray(cloud))
    save_ply(src_p, source)
    main(["icp", str(src_p), str(tgt_p), "--iters", "15"])
    out = capsys.readouterr().out
    assert "rmse" in out
