"""ctypes loader for the native C++ binned-SAH builder.

Compiles builder.cpp with g++ on first use (cached as libtracer_bvh.so next
to the source); falls back to the NumPy builder when no compiler is present.
No pybind11 -- the ABI is a single C function moving flat arrays, which
matches the FlatBVH SoA layout exactly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "builder.cpp")
_SO = os.path.join(_DIR, "libtracer_bvh.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.tracer_build_bvh.restype = ctypes.c_int
            lib.tracer_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_bvh_native_arrays(centers: np.ndarray, radii: np.ndarray,
                            leaf_size: int = 4, num_bins: int = 8,
                            max_depth: int = 40,
                            near_point=(0.0, 0.0, 0.0)):
    """Run the C++ builder; returns (node_min, node_max, escape, leaf_start,
    prim_idx) as NumPy arrays, or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    centers = np.ascontiguousarray(centers, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    n = len(radii)
    cap_nodes = 2 * n + 2
    # Worst case every leaf holds one real prim -> n leaves of leaf_size slots.
    cap_prims = (n + 1) * leaf_size

    node_min = np.empty((cap_nodes, 3), np.float32)
    node_max = np.empty((cap_nodes, 3), np.float32)
    escape = np.empty(cap_nodes, np.int32)
    leaf_start = np.empty(cap_nodes, np.int32)
    prim_idx = np.empty(cap_prims, np.int32)
    sizes = np.zeros(2, np.int32)

    near = np.ascontiguousarray(near_point, np.float32)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.tracer_build_bvh(
        fp(centers), fp(radii), n, leaf_size, num_bins, max_depth, fp(near),
        fp(node_min), fp(node_max), ip(escape), ip(leaf_start), ip(prim_idx),
        ip(sizes))
    if rc != 0:
        return None
    m, p = int(sizes[0]), int(sizes[1])
    return (node_min[:m].copy(), node_max[:m].copy(), escape[:m].copy(),
            leaf_start[:m].copy(), prim_idx[:p].copy())
