"""Native (C++) components, built on demand with g++ and loaded via ctypes.

The repo rule (SURVEY.md §7): components that are native in the reference stay
native here — the SBVH builder is CPU C++ in CudaTracerLib
(Engine/SpatialStructures/BVH/SplitBVHBuilder.cpp), so the TPU framework's
builder is C++ too; JAX consumes the flat arrays it emits.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None


def _build_lib() -> str:
    src = os.path.join(_DIR, "bvh_builder.cpp")
    so = os.path.join(_DIR, "_native.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", so + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(so + ".tmp", so)
    return so


def get_lib():
    """Compile-on-first-use native library; None if no toolchain."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        try:
            so = _build_lib()
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
        lib = ctypes.CDLL(so)
        lib.bvh_build.restype = ctypes.c_int
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.bvh_build_ex.restype = ctypes.c_int
        lib.bvh_build_ex.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.bvh_n_nodes.restype = ctypes.c_int
        lib.bvh_n_order.restype = ctypes.c_int
        lib.bvh_copy.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)
        ]
        _LIB = lib
        return _LIB


def build_bvh_native(tris: np.ndarray, leaf_size: int, n_bins: int,
                     max_depth: int, spatial: bool = True,
                     alpha: float = 1e-5):
    """Returns (nodes (M,16) f32, order (P,) i32, root) or None if unavailable.

    `spatial`: enable SBVH spatial splits (reference SplitBVHBuilder's
    default path); `alpha`: overlap gate as a fraction of root surface area."""
    lib = get_lib()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris.reshape(-1, 9), np.float32)
    with _LOCK:
        root = lib.bvh_build_ex(
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tris.shape[0], leaf_size, n_bins, max_depth,
            1 if spatial else 0, alpha,
        )
        n_nodes = lib.bvh_n_nodes()
        n_order = lib.bvh_n_order()
        nodes = np.empty((n_nodes, 16), np.float32)
        order = np.empty((n_order,), np.int32)
        lib.bvh_copy(
            nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        lib.bvh_release()
    return nodes, order, int(root)
