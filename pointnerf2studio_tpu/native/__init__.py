"""Native (C++) components.

The reference JIT-compiles its CUDA extension at import
(reference: pointnerf/models/neural_points/point_query.py:17-22);
here the C++ CPU reference querier is g++-compiled on first use and
cached next to the source. It serves as the deterministic oracle for
the jitted XLA query pipeline and as a host-side fallback querier.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "query_ref.cpp")
_LIB = os.path.join(_DIR, "libquery_ref.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.query_ref.restype = ctypes.c_int
    lib.query_ref.argtypes = [
        f32p, ctypes.c_int, u8p,                      # xyz, n, alive
        f32p, f32p,                                   # ranges_min, svsize
        ctypes.c_int, ctypes.c_int, ctypes.c_int,     # gx gy gz
        ctypes.c_int, ctypes.c_int,                   # max_o P
        ctypes.c_int, ctypes.c_int, ctypes.c_int,     # query_size
        ctypes.c_int, ctypes.c_int, ctypes.c_int,     # kernel_size
        f32p, ctypes.c_int, ctypes.c_int,             # raypos R D
        ctypes.c_int, ctypes.c_int, ctypes.c_float,   # SR K radius2
        ctypes.c_int,                                 # layered
        i32p, f32p, u8p, u8p,                         # outputs
    ]
    _lib = lib
    return lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def query_ref(
    xyz: np.ndarray,           # [N, 3] float32
    alive: Optional[np.ndarray],   # [N] bool or None
    ranges_min: np.ndarray,    # [3] float32
    scaled_vsize: np.ndarray,  # [3] float32
    dims: Tuple[int, int, int],
    max_o: int, P: int,
    query_size: Tuple[int, int, int],
    kernel_size: Tuple[int, int, int],
    raypos: np.ndarray,        # [R, D, 3] float32
    SR: int, K: int, radius2: float,
    layered: bool = True,
):
    """CPU oracle for the full grid-build + neighbor-query pipeline.

    Returns (sample_pidx [R,SR,K] int32, sample_loc [R,SR,3] f32,
    sample_mask [R,SR] bool, ray_mask [R] bool, n_occ int).
    """
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = xyz.shape[0]
    alive_u8 = np.ascontiguousarray(
        (np.ones(n, bool) if alive is None else alive), np.uint8)
    raypos = np.ascontiguousarray(raypos, np.float32)
    R, D, _ = raypos.shape
    rmin = np.ascontiguousarray(ranges_min, np.float32)
    svs = np.ascontiguousarray(scaled_vsize, np.float32)

    pidx = np.empty((R, SR, K), np.int32)
    loc = np.empty((R, SR, 3), np.float32)
    smask = np.empty((R, SR), np.uint8)
    rmask = np.empty((R,), np.uint8)
    n_occ = lib.query_ref(
        _ptr(xyz, ctypes.c_float), n, _ptr(alive_u8, ctypes.c_uint8),
        _ptr(rmin, ctypes.c_float), _ptr(svs, ctypes.c_float),
        dims[0], dims[1], dims[2], max_o, P,
        query_size[0], query_size[1], query_size[2],
        kernel_size[0], kernel_size[1], kernel_size[2],
        _ptr(raypos, ctypes.c_float), R, D,
        SR, K, ctypes.c_float(radius2), int(layered),
        _ptr(pidx, ctypes.c_int32), _ptr(loc, ctypes.c_float),
        _ptr(smask, ctypes.c_uint8), _ptr(rmask, ctypes.c_uint8))
    return pidx, loc, smask.astype(bool), rmask.astype(bool), int(n_occ)
