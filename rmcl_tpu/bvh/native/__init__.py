"""ctypes bindings for the native SAH BVH builder.

Gracefully degrades: if the shared library is absent, ``try_build_library``
compiles it with the local toolchain; if that fails too, callers fall back
to the numpy LBVH builder (rmcl_tpu.bvh.builder.build_bvh).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "librmcl_native.so")
_lib: Optional[ctypes.CDLL] = None


def try_build_library() -> bool:
    if os.path.exists(_LIB_PATH):
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not try_build_library():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rmcl_build_bvh_sah.restype = ctypes.c_int
    lib.rmcl_build_bvh_sah.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def build_bvh_sah_arrays(
    vertices: np.ndarray, faces: np.ndarray
) -> Tuple[np.ndarray, np.int32, np.ndarray, np.ndarray]:
    """Run the native builder. Returns (nodes (2T-1,16) f32, root_link,
    leaf_order (T,) i32, scene_aabb (6,) f32). Raises if unavailable."""
    lib = load()
    if lib is None:
        raise RuntimeError("native builder library unavailable")
    verts = np.ascontiguousarray(vertices, np.float32)
    fcs = np.ascontiguousarray(faces, np.int32)
    T = len(fcs)
    nodes = np.zeros((max(2 * T - 1, 1), 16), np.float32)
    leaf_order = np.zeros(T, np.int32)
    root = np.zeros(1, np.int32)
    aabb = np.zeros(6, np.float32)
    rc = lib.rmcl_build_bvh_sah(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(len(verts)),
        fcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int32(T),
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        root.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        leaf_order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        aabb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"native builder failed with code {rc}")
    return nodes, np.int32(root[0]), leaf_order, aabb


def bin_order(centroids: np.ndarray, bin_size: int) -> np.ndarray:
    """Native kd median-split bin ordering (matches
    bvh.bins._median_split_order). Raises if the library is unavailable."""
    lib = load()
    if lib is None:
        raise RuntimeError("native builder library unavailable")
    if not hasattr(lib, "_bin_order_ready"):
        lib.rmcl_bin_order.restype = ctypes.c_int
        lib.rmcl_bin_order.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib._bin_order_ready = True
    c = np.ascontiguousarray(centroids, np.float32)
    n = c.shape[0]
    out = np.empty(n, np.int64)
    rc = lib.rmcl_bin_order(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int64(n),
        np.int32(bin_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"native bin_order failed with code {rc}")
    return out
