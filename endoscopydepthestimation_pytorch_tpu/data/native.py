"""ctypes bindings for the native (C++) host rasterizer.

Compiles ``native/rasterizer.cpp`` on first use with g++ (cached as a
shared library next to the source) and exposes ``rasterize_pair_native``
with the exact signature/semantics of ``rasterizer.rasterize_pair``.
Falls back silently if no toolchain is available — callers should use
``get_rasterizer()`` which returns the fastest working implementation.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

from . import rasterizer as _py

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "rasterizer.cpp"
_LIB = _NATIVE_DIR / "librasterizer.so"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-o", str(_LIB), str(_SRC)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB))
        lib.rasterize_pair.restype = None
        lib.rasterize_pair.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception as e:  # no toolchain / compile failure: numpy fallback
        print(f"native rasterizer unavailable ({e}); using numpy fallback")
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def rasterize_pair_native(pair_extrinsics, pair_projections, pair_indexes,
                          point_cloud, mask_boundary, view_indexes_per_point,
                          clean_point_list, visible_view_indexes: List[int]):
    """Drop-in replacement for rasterizer.rasterize_pair (same returns)."""
    lib = _load()
    if lib is None:
        return _py.rasterize_pair(pair_extrinsics, pair_projections, pair_indexes,
                                  point_cloud, mask_boundary, view_indexes_per_point,
                                  clean_point_list, visible_view_indexes)

    points = _f64(np.asarray(point_cloud).reshape(-1, 4))
    n = points.shape[0]
    height, width = mask_boundary.shape[:2]
    col_1 = visible_view_indexes.index(pair_indexes[0])
    col_2 = visible_view_indexes.index(pair_indexes[1])
    vis_1 = _f32(view_indexes_per_point[:, col_1])
    vis_2 = _f32(view_indexes_per_point[:, col_2])
    clean = np.asarray(clean_point_list, dtype=np.float32)
    has_clean = 1 if clean.size else 0
    if not has_clean:
        clean = np.zeros(1, np.float32)
    mask = np.ascontiguousarray(mask_boundary, dtype=np.uint8)

    depth_mask = np.zeros((2, height, width), np.float32)
    depth = np.zeros((2, height, width), np.float32)
    flow_mask = np.zeros((2, height, width), np.float32)
    flow = np.zeros((2, height, width, 2), np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.rasterize_pair(
        ptr(points, ctypes.c_double), n,
        ptr(_f64(pair_projections[0]), ctypes.c_double),
        ptr(_f64(pair_extrinsics[0]), ctypes.c_double),
        ptr(_f64(pair_projections[1]), ctypes.c_double),
        ptr(_f64(pair_extrinsics[1]), ctypes.c_double),
        ptr(vis_1, ctypes.c_float), ptr(vis_2, ctypes.c_float),
        ptr(clean, ctypes.c_float), has_clean,
        ptr(mask, ctypes.c_uint8), height, width,
        ptr(depth_mask, ctypes.c_float), ptr(depth, ctypes.c_float),
        ptr(flow_mask, ctypes.c_float), ptr(flow, ctypes.c_float))

    return (depth_mask[..., None], depth[..., None],
            flow_mask[..., None], flow)


def get_rasterizer():
    """The fastest available rasterize_pair implementation."""
    return rasterize_pair_native if native_available() else _py.rasterize_pair
