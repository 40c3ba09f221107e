"""Native host-side kernels (SURVEY.md §2.7) via ctypes.

Compiled from ``voxel.cpp`` with g++ on first import (no pybind11 in the
image — SURVEY environment note); callers fall back to numpy when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "voxel.cpp")
_SO = os.path.join(_DIR, "_colvo_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.voxel_downsample.restype = ctypes.c_int64
        lib.voxel_downsample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.chain_poses.restype = None
        lib.chain_poses.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def voxel_downsample(
    points: np.ndarray, voxel: float, colors: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """One-pass hash-table voxel-grid averaging (see voxel.cpp)."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = len(pts)
    out_p = np.empty_like(pts)
    if colors is not None:
        cols = np.ascontiguousarray(colors, dtype=np.float32)
        out_c = np.empty_like(cols)
        c_in, c_out = _fptr(cols), _fptr(out_c)
    else:
        out_c = None
        c_in = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
        c_out = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    m = lib.voxel_downsample(_fptr(pts), c_in, n, ctypes.c_float(voxel), _fptr(out_p), c_out)
    if m < 0:
        raise RuntimeError("native voxel_downsample overflow")
    return out_p[:m].copy(), (out_c[:m].copy() if out_c is not None else None)


def chain_poses(rels: np.ndarray, renorm_every: int = 50) -> np.ndarray:
    """Chain (N, 4, 4) relative target→source transforms into (N+1, 4, 4)
    cam→world poses (float64, periodic renormalization)."""
    lib = _load()
    rels = np.ascontiguousarray(rels, dtype=np.float64)
    n = len(rels)
    out = np.empty((n + 1, 4, 4), dtype=np.float64)
    lib.chain_poses(
        rels.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        renorm_every,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
