"""ctypes bindings for the native data-pipeline core (native/).

Host-side hot loops — FPS, voxel downsampling, brute-force kNN — in
multithreaded C++ (``native/deepi2p_data.cpp``), mirroring the reference's
use of native code for its hot paths (``models/index_max_ext/``,
``data/kitti_helper.py:224-243``).  Falls back transparently to the numpy
implementations of :mod:`deepi2p_tpu.ops.sampling` when the library has not
been built (``make -C native``).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", "libdeepi2p_data.so"),
                 os.environ.get("DEEPI2P_NATIVE_LIB", "")):
        if cand and os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.fps.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_uint64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64)]
            lib.voxel_downsample.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            lib.voxel_downsample.restype = ctypes.c_int64
            lib.knn.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64)]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def fps(pts: np.ndarray, k: int, seed: int = 0,
        n_threads: int = 4) -> np.ndarray:
    """FPS indices over (N, 3) float32 points; native or numpy fallback."""
    lib = _find_lib()
    pts = np.ascontiguousarray(pts, np.float32)
    if lib is None:
        from ..ops.sampling import farthest_point_sample_np
        _, idx = farthest_point_sample_np(
            pts, k, np.random.default_rng(seed))
        return idx
    out = np.empty(k, np.int64)
    lib.fps(_fptr(pts), pts.shape[0], k, seed, n_threads, _iptr(out))
    return out


def voxel_downsample(pts: np.ndarray, voxel: float,
                     extras: Optional[np.ndarray] = None):
    lib = _find_lib()
    pts = np.ascontiguousarray(pts, np.float32)
    if lib is None:
        from ..ops.sampling import voxel_downsample_np
        return voxel_downsample_np(pts, voxel, extras)
    n = pts.shape[0]
    e = 0 if extras is None else extras.shape[1]
    ex = (np.ascontiguousarray(extras, np.float32) if extras is not None
          else np.zeros((n, 0), np.float32))
    out_p = np.empty((n, 3), np.float32)
    out_e = np.empty((n, max(e, 1)), np.float32)
    m = lib.voxel_downsample(_fptr(pts), _fptr(ex), n, e, voxel,
                             _fptr(out_p), _fptr(out_e))
    if extras is None:
        return out_p[:m].copy()
    return out_p[:m].copy(), out_e[:m, :e].copy()


def knn(query: np.ndarray, database: np.ndarray, k: int,
        n_threads: int = 4) -> np.ndarray:
    """(Nq, k) int64 nearest-database indices."""
    lib = _find_lib()
    query = np.ascontiguousarray(query, np.float32)
    database = np.ascontiguousarray(database, np.float32)
    if lib is None:
        d = np.sum((query[:, None] - database[None]) ** 2, axis=-1)
        return np.argsort(d, axis=1)[:, :k].astype(np.int64)
    out = np.empty((query.shape[0], k), np.int64)
    lib.knn(_fptr(query), query.shape[0], _fptr(database),
            database.shape[0], k, n_threads, _iptr(out))
    return out
