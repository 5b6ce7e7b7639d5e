"""Native (C++) host-side helpers, loaded via ctypes.

Compiled lazily with g++ on first use; every entry point has a pure-Python
fallback so the package works without a toolchain.  See ``voge_native.cpp``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "voge_native.cpp")
_LIB = os.path.join(_DIR, "_voge_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Return the ctypes library, building it if needed; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.vg_parse_floats.restype = ctypes.c_long
        lib.vg_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.vg_knn_mean_dist.restype = None
        lib.vg_knn_mean_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ]
        lib.vg_vert_edge_length.restype = None
        lib.vg_vert_edge_length.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_long, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def parse_floats(text: str, max_out: int) -> np.ndarray:
    """Fast whitespace-separated float parse; falls back to numpy."""
    lib = load()
    if lib is None:
        return np.array(text.split(), dtype=np.float32)[:max_out]
    buf = text.encode()
    out = np.empty(max_out, dtype=np.float32)
    n = lib.vg_parse_floats(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_out,
    )
    return out[:n]


def knn_mean_dist(points: np.ndarray, k: int, thr_max: float) -> np.ndarray:
    """Grid-accelerated clipped k-NN mean distance (self included, like the
    reference's topk over the full row).  Returns (N,) float32; None if the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty(pts.shape[0], dtype=np.float32)
    lib.vg_knn_mean_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], int(k), float(thr_max),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def vert_edge_length(verts: np.ndarray, faces: np.ndarray, default_l: float):
    """Native per-vertex mean adjacent-edge length; None if unavailable."""
    lib = load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int64)
    out = np.empty(v.shape[0], dtype=np.float32)
    lib.vg_vert_edge_length(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        f.shape[0] if f.ndim == 2 else 0,
        f.shape[1] if f.ndim == 2 else 3,
        float(default_l),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
