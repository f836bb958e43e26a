"""ctypes bindings for the native host-runtime library.

The TPU compute path is JAX/XLA/Pallas; host-side graph algorithms that
the reference also runs natively (region growing over the superpixel
adjacency, planecluster.cpp:98-167) live here as a small C++ library.
Loaded lazily; callers fall back to the pure-Python implementation when
the library hasn't been built (``python cartslam_tpu/native/build.py``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libcartnative.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = _LIB_PATH
    if not os.path.exists(path):
        try:  # build on first use when a toolchain is available
            from .build import build

            path = build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.cart_grow_clusters.restype = ctypes.c_int64
    lib.cart_grow_clusters.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def grow_clusters(
    num_labels: int,
    edges: np.ndarray,  # [E, 2] int64
    planes: np.ndarray,  # [L, 4] float
    ok: np.ndarray,  # [L] bool
    yaw_pitch_thresh: float = 0.2,
    d_thresh: float = 3.0,
    min_cluster: int = 32,
):
    """Native region growing; returns (assignments int64 [L], planes [C, 4]).

    Raises RuntimeError if the library is unavailable (check available()).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libcartnative.so not available")

    ea = np.ascontiguousarray(edges[:, 0], np.int64)
    eb = np.ascontiguousarray(edges[:, 1], np.int64)
    pl = np.ascontiguousarray(planes, np.float64)
    okc = np.ascontiguousarray(ok, np.uint8)
    assignments = np.zeros(num_labels, np.int64)
    cplanes = np.zeros((num_labels, 4), np.float64)

    n = lib.cart_grow_clusters(
        num_labels,
        ea.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        eb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ea),
        pl.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        okc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        float(yaw_pitch_thresh),
        float(d_thresh),
        int(min_cluster),
        assignments.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cplanes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        num_labels,
    )
    return assignments, cplanes[:n]
