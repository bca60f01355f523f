"""ctypes bridge to the native C++ point-cloud readers (reader.cpp).

Build once:  python -m hgmm.data.native --build
The Python loaders in hgmm.data.ply / hgmm.data.kitti call through here
automatically when the shared library exists, else use their portable
pure-python paths (same results; the native path matters for 10M+-point
multi-host ingest, SURVEY.md §8)."""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent / "_native"
_SRC = _DIR / "reader.cpp"
_LIB = _DIR / "libhgmm_io.so"
_lib_handle = None
_load_failed = False


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(_SRC), "-o", str(_LIB),
    ]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return _LIB


def _load():
    global _lib_handle, _load_failed
    if _lib_handle is not None or _load_failed:
        return _lib_handle
    if not _LIB.exists():
        # Not latched: the library may be built later in the process
        # (e.g. `native.build()` from tests or setup code).
        return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.hgmm_read_kitti_bin.restype = ctypes.c_int64
        lib.hgmm_read_kitti_bin.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.hgmm_read_ply_xyz.restype = ctypes.c_int64
        lib.hgmm_read_ply_xyz.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        try:
            lib.hgmm_voxel_downsample.restype = ctypes.c_int64
            lib.hgmm_voxel_downsample.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_void_p,
            ]
        except AttributeError:
            # Library built from an older reader.cpp: readers still work,
            # voxel_downsample() falls back to numpy.
            pass
        _lib_handle = lib
    except OSError:
        _load_failed = True
    return _lib_handle


def available() -> bool:
    return _load() is not None


def _read(fn_name: str, path: str) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    fn = getattr(lib, fn_name)
    n = fn(path.encode(), None)
    if n < 0:
        return None  # caller falls back to the python parser
    out = np.empty((n, 3), np.float32)
    n2 = fn(path.encode(), out.ctypes.data_as(ctypes.c_void_p))
    if n2 != n:
        return None
    return out


def load_kitti_bin(path: str) -> np.ndarray | None:
    return _read("hgmm_read_kitti_bin", path)


def load_ply(path: str) -> np.ndarray | None:
    return _read("hgmm_read_ply_xyz", path)


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray | None:
    """Native voxel-grid downsample (bit-compatible with the numpy fallback
    in hgmm.data.kitti.voxel_downsample). Returns None if the library is
    missing or predates this entry point."""
    lib = _load()
    if lib is None or not hasattr(lib, "hgmm_voxel_downsample"):
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty_like(pts)
    n = lib.hgmm_voxel_downsample(
        pts.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(pts.shape[0]),
        ctypes.c_float(voxel),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if n < 0:
        return None
    return out[:n]


if __name__ == "__main__":
    if "--build" in sys.argv:
        build()
        print(f"built {_LIB}")
    else:
        print(f"native lib present: {available()} ({_LIB})")
