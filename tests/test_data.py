import numpy as np
import pytest

from hgmm.data import native
from hgmm.data.kitti import (
    load_velodyne_bin,
    save_velodyne_bin,
    voxel_downsample,
)
from hgmm.data.ply import load_ply, save_ply


@pytest.fixture(scope="module")
def native_lib():
    try:
        native.build(verbose=False)
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    assert native.available()
    return native


def test_ply_roundtrip_binary(tmp_path):
    pts = np.random.default_rng(0).normal(size=(500, 3)).astype(np.float32)
    p = tmp_path / "a.ply"
    save_ply(p, pts, binary=True)
    np.testing.assert_allclose(load_ply(p), pts, rtol=1e-6)


def test_ply_roundtrip_ascii(tmp_path):
    pts = np.random.default_rng(1).normal(size=(100, 3)).astype(np.float32)
    p = tmp_path / "a.ply"
    save_ply(p, pts, binary=False)
    np.testing.assert_allclose(load_ply(p), pts, rtol=1e-5, atol=1e-6)


def test_kitti_bin_roundtrip(tmp_path):
    pts = np.random.default_rng(2).normal(size=(1000, 3)).astype(np.float32)
    p = tmp_path / "000000.bin"
    save_velodyne_bin(p, pts)
    np.testing.assert_allclose(load_velodyne_bin(p), pts, rtol=1e-6)


def test_voxel_downsample():
    pts = np.array(
        [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [1.5, 1.5, 1.5]], np.float32
    )
    out = voxel_downsample(pts, 1.0)
    assert out.shape[0] == 2
    # centroid of the first two
    assert np.any(np.all(np.abs(out - [0.015, 0.015, 0.015]) < 1e-6, axis=1))


def test_native_kitti_matches_python(tmp_path, native_lib):
    pts = np.random.default_rng(3).normal(size=(5000, 3)).astype(np.float32)
    p = tmp_path / "scan.bin"
    save_velodyne_bin(p, pts)
    out = native_lib.load_kitti_bin(str(p))
    assert out is not None
    np.testing.assert_array_equal(out, pts)


def test_native_ply_matches_python(tmp_path, native_lib):
    pts = np.random.default_rng(4).normal(size=(3000, 3)).astype(np.float32)
    p = tmp_path / "scan.ply"
    save_ply(p, pts, binary=True)
    out = native_lib.load_ply(str(p))
    assert out is not None
    np.testing.assert_array_equal(out, pts)


def test_native_ply_rejects_ascii(tmp_path, native_lib):
    pts = np.random.default_rng(5).normal(size=(50, 3)).astype(np.float32)
    p = tmp_path / "a.ply"
    save_ply(p, pts, binary=False)
    assert native_lib.load_ply(str(p)) is None  # falls back to python parser
    np.testing.assert_allclose(load_ply(p), pts, rtol=1e-5, atol=1e-6)
