"""Generate the checked-in KITTI-format mini fixture (SURVEY.md §5.2
"KITTI two-frame smoke test with a tiny checked-in sample"; VERDICT round-1
item 3). Synthetic content in the REAL file formats: velodyne .bin scans,
poses.txt (cam0-frame 3x4 rows), calib.txt (Tr velo->cam).

Deterministic — rerun to regenerate:  python tests/fixtures/make_kitti_mini.py
"""

from pathlib import Path

import numpy as np

OUT = Path(__file__).parent / "kitti_mini"
N_FRAMES = 4
N_WORLD = 6000


def make_world(rng: np.random.Generator) -> np.ndarray:
    """Structured scene with geometry constraining EVERY pose direction:
    ground plane (z/roll/pitch), a y-facing and an x-facing wall (y+yaw, x),
    plus boxes and pillars for texture. A plane-only scene leaves the pose
    unobservable along the planes and the registration rightly slides."""
    ground = np.stack(
        [
            rng.uniform(-2, 12, N_WORLD // 3),
            rng.uniform(-5, 5, N_WORLD // 3),
            rng.normal(0.0, 0.02, N_WORLD // 3) - 1.7,
        ],
        axis=1,
    )
    wall_y = np.stack(  # facade along x at y = 4.5: pins y and yaw
        [
            rng.uniform(-2, 12, N_WORLD // 6),
            np.full(N_WORLD // 6, 4.5) + rng.normal(0, 0.02, N_WORLD // 6),
            rng.uniform(-1.7, 1.5, N_WORLD // 6),
        ],
        axis=1,
    )
    wall_x = np.stack(  # facade along y at x = -1.5: pins x
        [
            np.full(N_WORLD // 6, -1.5) + rng.normal(0, 0.02, N_WORLD // 6),
            rng.uniform(-5, 5, N_WORLD // 6),
            rng.uniform(-1.7, 1.5, N_WORLD // 6),
        ],
        axis=1,
    )
    chunks = [ground, wall_y, wall_x]
    # Boxes: two axis-aligned faces each, pinning x AND y locally.
    for cx, cy in [(3.0, -2.0), (7.0, 1.0), (10.0, -3.0)]:
        m = N_WORLD // 18
        face_x = np.stack(
            [np.full(m, cx), cy + rng.uniform(-0.5, 0.5, m),
             rng.uniform(-1.7, -0.2, m)], axis=1
        )
        face_y = np.stack(
            [cx + rng.uniform(-0.5, 0.5, m), np.full(m, cy),
             rng.uniform(-1.7, -0.2, m)], axis=1
        )
        chunks += [face_x, face_y]
    for cx, cy in [(2.0, 3.0), (8.5, 3.5)]:
        m = N_WORLD // 18
        ang = rng.uniform(0, 2 * np.pi, m)
        z = rng.uniform(-1.7, 1.0, m)
        chunks.append(
            np.stack([cx + 0.3 * np.cos(ang), cy + 0.3 * np.sin(ang), z], axis=1)
        )
    return np.concatenate(chunks).astype(np.float32)


def yaw(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)


def main() -> None:
    rng = np.random.default_rng(42)
    world = make_world(rng)

    # Velodyne sensor trajectory in the world frame: forward + slight turn.
    T_w_velo = []
    for k in range(N_FRAMES):
        R = yaw(0.04 * k)
        t = np.array([0.4 * k, 0.05 * k, 0.0])
        T_w_velo.append((R, t))

    # Tr (velo -> cam): the standard axis permutation + small lever arm.
    R_tr = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float64)
    t_tr = np.array([0.01, -0.05, -0.27])

    (OUT / "velodyne").mkdir(parents=True, exist_ok=True)
    for k, (R, t) in enumerate(T_w_velo):
        # Scan = world points in the velodyne frame (+ sensor noise).
        local = (world - t) @ R  # R^T applied from the right
        local = local + rng.normal(0, 0.005, local.shape)
        refl = rng.uniform(0, 1, (local.shape[0], 1))
        arr = np.concatenate([local, refl], axis=1).astype("<f4")
        arr.tofile(OUT / "velodyne" / f"{k:06d}.bin")

    # poses.txt: P_k = T_{cam0 <- cam_k} = (T_w_cam0)^-1 T_w_camk with
    # T_w_camk = T_w_velok o Tr^-1.
    def compose(Ra, ta, Rb, tb):
        return Ra @ Rb, Ra @ tb + ta

    def inverse(R, t):
        return R.T, -(R.T @ t)

    Tr_inv = inverse(R_tr, t_tr)
    T_w_cam = [compose(R, t, *Tr_inv) for R, t in T_w_velo]
    T_cam0_inv = inverse(*T_w_cam[0])
    lines = []
    for R, t in T_w_cam:
        Pr, Pt = compose(*T_cam0_inv, R, t)
        lines.append(" ".join(f"{v:.9e}" for v in np.hstack([Pr, Pt[:, None]]).ravel()))
    (OUT / "poses.txt").write_text("\n".join(lines) + "\n")

    # calib.txt with dummy projection rows + the Tr entry (real format).
    dummy = " ".join(["0.0"] * 12)
    tr_line = " ".join(f"{v:.9e}" for v in np.hstack([R_tr, t_tr[:, None]]).ravel())
    (OUT / "calib.txt").write_text(
        f"P0: {dummy}\nP1: {dummy}\nP2: {dummy}\nP3: {dummy}\nTr: {tr_line}\n"
    )
    print(f"wrote {N_FRAMES} frames, {world.shape[0]} pts/frame -> {OUT}")


if __name__ == "__main__":
    main()
