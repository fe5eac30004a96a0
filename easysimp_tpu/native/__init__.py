"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA; these are the HOST-side pieces the reference
delegates to native libraries (SURVEY.md §2.9): fixed-radius neighbor search
(NearestNeighbors.jl KD-tree equivalent) for the unstructured filter cache.
Builds on first use with g++ (-O3 -fopenmp); consumers fall back to
scipy.cKDTree when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

__all__ = ["get_lib", "neighbor_search", "is_available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "neighbor_search.cpp")
_SO = os.path.join(_DIR, f"_native_{sys.implementation.cache_tag}.so")
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
           _SRC, "-o", _SO]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        # retry without -march/-fopenmp (portability)
        cmd = ["g++", "-O3", "-fPIC", "-shared", _SRC, "-o", _SO]
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            return False
    return res.returncode == 0 and os.path.exists(_SO)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.nbsearch_count.restype = ctypes.c_int64
    lib.nbsearch_count.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.nbsearch_fill.restype = None
    lib.nbsearch_fill.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return get_lib() is not None


def neighbor_search(centers: np.ndarray, radius: float):
    """All-pairs fixed-radius search: returns CSR (offsets, idx, weights).

    offsets: (n+1,) int64; idx: (total,) int32 neighbor ids;
    weights: (total,) float64 cone weights max(0, R - d).
    Raises RuntimeError if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native neighbor search unavailable")
    centers = np.ascontiguousarray(centers, dtype=np.float64)
    n = centers.shape[0]
    offsets = np.zeros(n + 1, dtype=np.int64)
    cptr = centers.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    optr = offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    total = lib.nbsearch_count(cptr, n, float(radius), optr)
    idx = np.empty(total, dtype=np.int32)
    weights = np.empty(total, dtype=np.float64)
    lib.nbsearch_fill(
        cptr, n, float(radius), optr,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return offsets, idx, weights
