"""ctypes binding for the native PLY loader (builds lazily with g++).

``load(path, max_sh_degree)`` returns the same SoA tuple as the NumPy
parser in scene/io.py: (positions, sh, opacity, scales, quats). Raises on
any failure — scene.io falls back to the NumPy path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ply_loader.cpp")

_lock = threading.Lock()
_lib = None


def _lib_path() -> str:
    # The build artifact is keyed by the source hash: never committed, never
    # stale, never a foreign binary (a fresh checkout always rebuilds).
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"_ply_loader-{digest}.so")


def _build(lib_path: str) -> None:
    # Per-process tmp name: two processes building the same digest
    # concurrently (fresh checkout + parallel pytest/bench subprocesses)
    # must not os.replace each other's half-written output — the in-module
    # threading.Lock only serializes within one process.
    tmp = f"{lib_path}.{os.getpid()}.tmp"
    subprocess.run(
        [
            "g++",
            "-O3",
            "-shared",
            "-fPIC",
            "-std=c++17",
            _SRC,
            "-o",
            tmp,
        ],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, lib_path)


def _get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        _LIB = _lib_path()
        if not os.path.exists(_LIB):
            _build(_LIB)
        lib = ctypes.CDLL(_LIB)
        lib.ply_num_vertices.restype = ctypes.c_longlong
        lib.ply_num_vertices.argtypes = [ctypes.c_char_p]
        lib.ply_load.restype = ctypes.c_int
        f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
        lib.ply_load.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_longlong,
            f32p,
            f32p,
            f32p,
            f32p,
            f32p,
        ]
        _lib = lib
        return lib


def load(path: str, max_sh_degree: int = 2):
    lib = _get_lib()
    n = lib.ply_num_vertices(path.encode())
    if n < 0:
        raise ValueError(f"native parser cannot read {path!r}")
    n_rest = 3 * ((max_sh_degree + 1) ** 2 - 1)
    positions = np.empty((n, 3), dtype=np.float32)
    sh = np.empty((n, 3 + n_rest), dtype=np.float32)
    opacity = np.empty((n,), dtype=np.float32)
    scales = np.empty((n, 3), dtype=np.float32)
    quats = np.empty((n, 4), dtype=np.float32)
    rc = lib.ply_load(
        path.encode(), max_sh_degree, n, positions, sh, opacity, scales, quats
    )
    if rc != 0:
        raise ValueError(f"native PLY load failed (code {rc}) for {path!r}")
    return positions, sh, opacity, scales, quats
