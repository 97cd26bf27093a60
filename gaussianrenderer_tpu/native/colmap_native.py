"""ctypes binding for the native COLMAP points3D.bin reader.

``load_points(path)`` returns the same (xyz f64 (N,3), rgb u8 (N,3),
err f64 (N,)) tuple as ``scene.colmap.read_points3d_bin``'s Python loop.
Raises on any failure — scene.colmap falls back to the Python path.
Build pattern identical to :mod:`ply_native` (lazy g++, hash-keyed
artifact, per-process tmp replace).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "colmap_loader.cpp")

_lock = threading.Lock()
_lib = None


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"_colmap_loader-{digest}.so")


def _build(lib_path: str) -> None:
    tmp = f"{lib_path}.{os.getpid()}.tmp"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, lib_path)


def _get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib_path = _lib_path()
        if not os.path.exists(lib_path):
            _build(lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.colmap_points_count.restype = ctypes.c_longlong
        lib.colmap_points_count.argtypes = [ctypes.c_char_p]
        lib.colmap_points_load.restype = ctypes.c_int
        lib.colmap_points_load.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return lib


def load_points(path: str):
    lib = _get_lib()
    n = lib.colmap_points_count(path.encode())
    if n < 0:
        raise ValueError(f"native parser cannot read {path!r}")
    xyz = np.empty((n, 3), dtype=np.float64)
    rgb = np.empty((n, 3), dtype=np.uint8)
    err = np.empty((n,), dtype=np.float64)
    rc = lib.colmap_points_load(path.encode(), n, xyz, rgb, err)
    if rc != 0:
        raise ValueError(f"native points3D load failed (code {rc}) {path!r}")
    return xyz, rgb, err
