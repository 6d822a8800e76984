"""ctypes bindings for the native voxel hash (auto-built with make on first use).

`NativeVoxelHashMap` carries the reference VoxelHashMap's host-side semantics
(insertion-order caps, pose updates + far-voxel eviction, padded exports, the
27-neighborhood correspondence search) in C++/OpenMP — the runtime component
that stays off-device while the TPU kernels consume its padded exports.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB = None
_BUILD_FAILED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    here = Path(__file__).parent
    so = here / "libvoxel_hash.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(here)], check=True, capture_output=True, timeout=120
            )
        except Exception:
            _BUILD_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        _BUILD_FAILED = True
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.vh_create.restype = ctypes.c_void_p
    lib.vh_create.argtypes = [ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int]
    lib.vh_destroy.argtypes = [ctypes.c_void_p]
    lib.vh_clear.argtypes = [ctypes.c_void_p]
    lib.vh_size.restype = ctypes.c_int64
    lib.vh_size.argtypes = [ctypes.c_void_p]
    lib.vh_add_points.argtypes = [ctypes.c_void_p, f32p, f32p, ctypes.c_int64]
    lib.vh_add_points_posed.argtypes = [ctypes.c_void_p, f32p, f32p, ctypes.c_int64, f64p]
    lib.vh_remove_far.argtypes = [ctypes.c_void_p, f64p]
    lib.vh_export.restype = ctypes.c_int64
    lib.vh_export.argtypes = [ctypes.c_void_p, f32p, f32p]
    lib.vh_get_correspondences.restype = ctypes.c_int64
    lib.vh_get_correspondences.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int64, ctypes.c_double, f32p, f32p,
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeVoxelHashMap:
    def __init__(self, voxel_size: float, max_distance: float, max_points_per_voxel: int, dim: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native voxel hash library unavailable (build failed)")
        self._lib = lib
        self._h = lib.vh_create(voxel_size, max_distance, max_points_per_voxel, dim)
        self.dim = dim

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vh_destroy(self._h)
            self._h = None

    def __len__(self) -> int:
        return int(self._lib.vh_size(self._h))

    def clear(self):
        self._lib.vh_clear(self._h)

    def add_points(self, pts: np.ndarray, feats: Optional[np.ndarray] = None):
        pts = np.ascontiguousarray(pts[:, :3], dtype=np.float32)
        fp = None
        if self.dim > 0 and feats is not None:
            feats = np.ascontiguousarray(feats, dtype=np.float32)
            fp = _fptr(feats)
        self._lib.vh_add_points(self._h, _fptr(pts), fp, pts.shape[0])

    def update(self, pts: np.ndarray, pose: np.ndarray, feats: Optional[np.ndarray] = None):
        pts = np.ascontiguousarray(pts[:, :3], dtype=np.float32)
        pose = np.ascontiguousarray(pose, dtype=np.float64)
        fp = None
        if self.dim > 0 and feats is not None:
            feats = np.ascontiguousarray(feats, dtype=np.float32)
            fp = _fptr(feats)
        self._lib.vh_add_points_posed(self._h, _fptr(pts), fp, pts.shape[0], _dptr(pose))
        origin = np.ascontiguousarray(pose[:3, 3], dtype=np.float64)
        self._lib.vh_remove_far(self._h, _dptr(origin))

    def remove_far_away_points(self, origin: np.ndarray):
        origin = np.ascontiguousarray(np.asarray(origin, dtype=np.float64).reshape(3))
        self._lib.vh_remove_far(self._h, _dptr(origin))

    def export(self) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        n = len(self)
        pts = np.empty((max(n, 1), 3), dtype=np.float32)
        feats = np.empty((max(n, 1), self.dim), dtype=np.float32) if self.dim > 0 else None
        k = self._lib.vh_export(self._h, _fptr(pts), _fptr(feats) if feats is not None else None)
        pts = pts[:k]
        return (pts, feats[:k] if feats is not None else None)

    def get_correspondences(self, queries: np.ndarray, max_dist: float):
        queries = np.ascontiguousarray(queries[:, :3], dtype=np.float32)
        n = queries.shape[0]
        src = np.empty((max(n, 1), 3), dtype=np.float32)
        tgt = np.empty((max(n, 1), 3), dtype=np.float32)
        k = self._lib.vh_get_correspondences(
            self._h, _fptr(queries), n, float(max_dist), _fptr(src), _fptr(tgt)
        )
        return src[:k], tgt[:k]
