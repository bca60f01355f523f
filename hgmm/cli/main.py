"""hgmm command-line interface (SURVEY.md §1.2: fit-gmm / register /
odometry / bench / icp commands — the TPU-native equivalent of the
reference's main.cpp argv driver, SURVEY.md §2.1 item 1)."""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _load_cloud(path: str) -> np.ndarray:
    p = Path(path)
    if p.suffix == ".ply":
        from hgmm.data.ply import load_ply

        return load_ply(p)
    if p.suffix == ".bin":
        from hgmm.data.kitti import load_velodyne_bin

        return load_velodyne_bin(p)
    if p.suffix in (".npy",):
        return np.load(p)
    raise SystemExit(f"unsupported cloud format: {p.suffix}")


def cmd_fit_gmm(args) -> None:
    import jax.numpy as jnp

    from hgmm.models.gmm import Gmm
    from hgmm.models.gmm_tree import GmmTree
    from hgmm.utils import checkpoint as ckpt

    pts = jnp.asarray(_load_cloud(args.cloud))
    t0 = time.perf_counter()
    if args.tree:
        tree, lls = GmmTree.fit(
            pts, branch=args.branch, levels=args.levels, em_iters=args.iters
        )
        ckpt.save_tree(args.out, tree)
        print(f"tree fit: {tree.n_leaves} leaves, loglik/level={np.asarray(lls)}")
    else:
        gmm, lls = Gmm.fit(pts, k=args.k, n_iters=args.iters)
        ckpt.save_mixture(args.out, gmm.params)
        print(f"gmm fit: K={args.k}, final loglik={float(lls[-1]):.2f}")
    print(f"({time.perf_counter() - t0:.2f}s) saved -> {args.out}")


def cmd_register(args) -> None:
    import jax.numpy as jnp

    from hgmm.configs.presets import PRESETS
    from hgmm.pipelines.register import register_pair

    preset = PRESETS[args.preset]
    source = jnp.asarray(_load_cloud(args.source))
    target = jnp.asarray(_load_cloud(args.target))
    t0 = time.perf_counter()
    res = register_pair(
        source,
        target=target,
        model_kind=preset.model_kind,
        k=preset.k,
        branch=preset.branch,
        levels=preset.levels,
        fit_iters=preset.fit_iters,
        complexity_threshold=(
            preset.complexity_threshold
            if args.complexity_threshold is None
            else args.complexity_threshold
        ),
        n_iters=preset.reg_iters,
        method=preset.method,
        top_k=preset.top_k,
        outlier_logit=preset.outlier_logit,
    )
    dt = time.perf_counter() - t0
    T = np.asarray(res.pose.matrix())
    print(f"converged={bool(res.converged)} in {dt:.2f}s; transform:")
    print(T)
    if args.out:
        np.save(args.out, T)
        print(f"saved -> {args.out}")
    if args.export_aligned:
        from hgmm.viz.export import export_alignment

        export_alignment(args.export_aligned, source, target, res.pose)
        print(f"aligned clouds -> {args.export_aligned}")


def cmd_odometry(args) -> None:
    from hgmm.data.kitti import (
        load_calib_velo_to_cam,
        load_poses,
        load_velodyne_bin,
        sequence_scan_paths,
    )
    from hgmm.pipelines.odometry import OdometryConfig, refine_odometry, run_odometry
    from hgmm.utils.profiling import MetricsLog

    paths = sequence_scan_paths(args.sequence)
    if args.max_frames:
        paths = paths[: args.max_frames]
    scans = (load_velodyne_bin(p) for p in paths)
    cfg = OdometryConfig(
        model_kind=args.model,
        voxel=args.voxel,
        bucket=args.bucket,
        fit_iters=args.fit_iters,
        reg_iters=args.reg_iters,
        complexity_threshold=args.complexity_threshold,
        outlier_logit=(
            None if args.outlier_logit != args.outlier_logit else args.outlier_logit
        ),
    )
    metrics = MetricsLog(args.metrics) if args.metrics else None
    mesh = None
    if args.sharded:
        from hgmm.parallel import make_mesh

        mesh = make_mesh()
    t0 = time.perf_counter()
    res = run_odometry(
        scans, cfg, checkpoint_path=args.checkpoint, checkpoint_every=10,
        metrics=metrics, mesh=mesh, detect_closures=args.detect_closures,
    )
    dt = time.perf_counter() - t0
    if res.closures is not None:
        pairs = list(
            zip(np.asarray(res.closures.i).tolist(),
                np.asarray(res.closures.j).tolist())
        )
        print(f"loop closures accepted: {pairs}")
    final_poses = res.abs_poses
    if args.refine:
        refined = refine_odometry(res, mesh=mesh)
        final_poses = refined.poses()
        traj = np.asarray(refined.t)
    else:
        traj = np.stack([np.asarray(p.t) for p in res.abs_poses])
    out = args.out or "trajectory.npy"
    np.save(out, traj)
    print(f"{len(res.abs_poses)} poses in {dt:.1f}s -> {out}")

    if args.map:
        # Fuse the scans by the (refined, if --refine) poses into one
        # global GMM-tree map (pipelines.mapping; the sharded config-5
        # fit when --sharded). Reload later with utils.checkpoint.load_tree
        # and localize new scans via pipelines.mapping.localize.
        from hgmm.pipelines.mapping import MapConfig, build_map
        from hgmm.utils import checkpoint as ckpt

        # Re-read the scans for the fuse pass (holding a full KITTI
        # sequence in RAM through the whole odometry run would be GBs;
        # round-5 review item). --voxel 0 passes through as 0 (disable),
        # NOT auto: `args.voxel or None` would coerce an explicit 0.
        tree = build_map(
            [load_velodyne_bin(p) for p in paths], final_poses,
            MapConfig(voxel=args.voxel), mesh=mesh,
        )
        ckpt.save_tree(args.map, tree)
        print(f"global map ({tree.n_leaves} leaves) -> {args.map}")

    if args.plot:
        from hgmm.viz.export import export_trajectory

        gt_traj = None
        if args.poses:
            from hgmm.data.kitti import load_calib_velo_to_cam, load_poses
            from hgmm.eval.metrics import kitti_gt_trajectory

            seq = Path(args.sequence)
            calib_path = args.calib or (seq / "calib.txt")
            gt_traj = kitti_gt_trajectory(
                load_poses(args.poses), load_calib_velo_to_cam(calib_path)
            )[: len(final_poses)]
        export_trajectory(
            args.plot, res.abs_poses, gt_poses=gt_traj,
            refined_poses=(final_poses if args.refine else None),
            closures=res.closures,
        )
        print(f"trajectory plot -> {args.plot}")

    if args.poses:
        # ATE against KITTI ground truth (BASELINE.json "KITTI pair ATE").
        from hgmm.eval.metrics import kitti_ate

        seq = Path(args.sequence)
        calib_path = args.calib or (seq / "calib.txt")
        gt = load_poses(args.poses)
        calib = load_calib_velo_to_cam(calib_path)
        # ATE of the trajectory actually written out (post-refinement when
        # --refine ran; the dead-reckoned chain otherwise).
        err = float(kitti_ate(final_poses, gt, calib))
        print(f"ATE vs ground truth: {err:.4f} m over {len(final_poses)} frames")
        if metrics is not None:
            metrics.log(
                {"event": "ate", "ate_m": err, "frames": len(final_poses),
                 "wall_s": dt, "refined": bool(args.refine)}
            )


def cmd_localize(args) -> None:
    """Relocalize a scan against a saved global map (pipelines.mapping)."""
    import jax.numpy as jnp

    from hgmm.pipelines.mapping import localize
    from hgmm.utils import checkpoint as ckpt

    tree = ckpt.load_tree(args.map)
    scan = _load_cloud(args.scan)
    mesh = None
    if args.sharded:
        from hgmm.parallel import make_mesh

        mesh = make_mesh()
    init = None
    if args.init:
        from hgmm.models.se3 import Pose

        T = np.load(args.init)
        init = Pose(jnp.asarray(T[:3, :3]), jnp.asarray(T[:3, 3]))
    t0 = time.perf_counter()
    res = localize(
        scan, tree, init_pose=init, mesh=mesh, n_iters=args.iters,
        outlier_logit=(
            None if args.outlier_logit != args.outlier_logit
            else args.outlier_logit
        ),
    )
    dt = time.perf_counter() - t0
    T = np.asarray(res.pose.matrix())
    print(f"converged={bool(res.converged)} in {dt:.2f}s; scan->map transform:")
    print(T)
    if args.out:
        np.save(args.out, T)
        print(f"saved -> {args.out}")


def cmd_icp(args) -> None:
    import jax.numpy as jnp

    from hgmm.baselines.icp import icp

    source = jnp.asarray(_load_cloud(args.source))
    target = jnp.asarray(_load_cloud(args.target))
    res = icp(source, target, n_iters=args.iters)
    print(np.asarray(res.pose.matrix()))
    print(f"final match rmse: {float(res.rmse_history[-1]):.6f}")


def cmd_bench(args) -> None:
    import runpy

    saved_argv = sys.argv
    sys.argv = ["bench.py"] + (["--trace", args.trace] if args.trace else [])
    try:
        runpy.run_path(
            str(Path(__file__).resolve().parents[2] / "bench.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = saved_argv


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="hgmm", description=__doc__)
    p.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force a JAX platform (this environment's sitecustomize pins "
        "the TPU tunnel; --platform cpu overrides it, e.g. to run the CLI "
        "while the chip is busy)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("fit-gmm", help="fit a flat GMM or GMM-tree to a cloud")
    f.add_argument("cloud")
    f.add_argument("--out", default="mixture.npz")
    f.add_argument("--tree", action="store_true")
    f.add_argument("--k", type=int, default=64)
    f.add_argument("--branch", type=int, default=8)
    f.add_argument("--levels", type=int, default=3)
    f.add_argument("--iters", type=int, default=20)
    f.set_defaults(fn=cmd_fit_gmm)

    r = sub.add_parser("register", help="register source cloud onto target")
    r.add_argument("source")
    r.add_argument("target")
    r.add_argument("--preset", default="config2_tree_8x3")
    r.add_argument(
        "--complexity-threshold", type=float, default=None,
        help="adaptive-cut threshold override (0 = pure leaves)",
    )
    r.add_argument("--out", default=None)
    r.add_argument("--export-aligned", default=None)
    r.set_defaults(fn=cmd_register)

    o = sub.add_parser("odometry", help="KITTI sequence odometry")
    o.add_argument("sequence", help="KITTI sequence dir (with velodyne/)")
    o.add_argument("--max-frames", type=int, default=None)
    o.add_argument(
        "--model", choices=("tree", "flat"), default="tree",
        help="per-frame target model (round-3 verdict: the old --tree flag "
        "could never be false, making flat mode unreachable)",
    )
    o.add_argument("--voxel", type=float, default=0.3)
    o.add_argument("--bucket", type=int, default=16384)
    o.add_argument("--fit-iters", type=int, default=10)
    o.add_argument("--reg-iters", type=int, default=30)
    o.add_argument("--complexity-threshold", type=float, default=0.0)
    o.add_argument(
        "--outlier-logit", type=float, default=-8.0,
        help="uniform outlier log-density (see OdometryConfig); nan disables",
    )
    o.add_argument("--checkpoint", default=None)
    o.add_argument(
        "--refine", action="store_true",
        help="pose-graph refinement of the chain (+ detected closures)",
    )
    o.add_argument(
        "--detect-closures", action="store_true",
        help="propose + registration-verify loop closures, feed --refine",
    )
    o.add_argument(
        "--sharded", action="store_true",
        help="run fits/registrations/refinement points-sharded over the "
        "full device mesh (config 5; Schur pose-graph path for --refine)",
    )
    o.add_argument("--out", default=None)
    o.add_argument(
        "--map", default=None, metavar="NPZ",
        help="fuse scans by the final poses into a global GMM-tree map "
        "and save it (pipelines.mapping; localize new scans against it "
        "with mapping.localize)",
    )
    o.add_argument(
        "--plot", default=None, metavar="PNG",
        help="top-down trajectory plot (odometry vs refined vs ground "
        "truth, closure chords)",
    )
    o.add_argument("--poses", default=None, help="KITTI poses.txt for ATE eval")
    o.add_argument("--calib", default=None, help="calib.txt (default: sequence dir)")
    o.add_argument("--metrics", default=None, help="JSONL metrics sink path")
    o.set_defaults(fn=cmd_odometry)

    lz = sub.add_parser(
        "localize", help="relocalize a scan against a saved global map"
    )
    lz.add_argument("scan", help="scan cloud (.bin/.ply/.npy)")
    lz.add_argument("map", help="map .npz from `hgmm odometry --map`")
    lz.add_argument(
        "--init", default=None,
        help=".npy 4x4 initial transform guess (e.g. last known pose)",
    )
    lz.add_argument("--iters", type=int, default=40)
    lz.add_argument(
        "--outlier-logit", type=float, default=-8.0,
        help="uniform outlier log-density; nan disables (scans usually "
        "see unmapped geometry — keep gating on)",
    )
    lz.add_argument("--sharded", action="store_true")
    lz.add_argument("--out", default=None, help="save the 4x4 transform (.npy)")
    lz.set_defaults(fn=cmd_localize)

    i = sub.add_parser("icp", help="ICP baseline registration")
    i.add_argument("source")
    i.add_argument("target")
    i.add_argument("--iters", type=int, default=30)
    i.set_defaults(fn=cmd_icp)

    b = sub.add_parser("bench", help="run the headline benchmark")
    b.add_argument(
        "--trace", default=None, metavar="DIR",
        help="capture a jax.profiler (Perfetto/TensorBoard) trace to DIR",
    )
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
