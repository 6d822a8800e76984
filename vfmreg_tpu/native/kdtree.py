"""ctypes bindings for the native KD-tree (auto-built with make on first use).

`NativeKDTree` is the host-side NN runtime replacing the reference's external
NN libraries on the ragged host paths: faiss `FaissKNeighbors`
(`vfm_reg/utils.py:19-44`) behind `utils.pcl.KNeighbors`, and the hdbscan
library's KD-tree Boruvka MST (`registration_node.py:735`) behind
`utils.hdbscan`. Falls back to `None` (callers keep a numpy path) when the
toolchain is unavailable.
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
    so = here / "libkdtree.so"

    def _build(force: bool) -> bool:
        try:
            cmd = ["make", "-C", str(here)] + (["-B"] if force else []) + ["libkdtree.so"]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False

    if not so.exists() and not _build(force=False):
        _BUILD_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.kd_single_linkage  # newest symbol: stale pre-built .so -> rebuild
    except AttributeError:
        # dlopen caches by pathname, so re-CDLL'ing the rebuilt file would
        # return the stale image; load the fresh build through a unique copy.
        import shutil
        import tempfile

        lib = None
        if _build(force=True):
            try:
                tmp = tempfile.NamedTemporaryFile(
                    suffix=".so", prefix="libkdtree_", delete=False
                )
                tmp.close()
                shutil.copy(str(so), tmp.name)
                lib = ctypes.CDLL(tmp.name)
            except OSError:
                lib = None
        if lib is None:
            _BUILD_FAILED = True
            return None
    except OSError:
        _BUILD_FAILED = True
        return None

    try:
        f64p = ctypes.POINTER(ctypes.c_double)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.kd_build.restype = ctypes.c_void_p
        lib.kd_build.argtypes = [f64p, ctypes.c_int64, ctypes.c_int]
        lib.kd_free.argtypes = [ctypes.c_void_p]
        lib.kd_knn.argtypes = [ctypes.c_void_p, f64p, ctypes.c_int64, ctypes.c_int, i64p, f64p]
        lib.kd_mst_mutual_reachability.restype = ctypes.c_int64
        lib.kd_mst_mutual_reachability.argtypes = [ctypes.c_void_p, f64p, i64p, i64p, f64p]
        lib.kd_single_linkage.argtypes = [i64p, i64p, f64p, ctypes.c_int64, f64p]
    except AttributeError:
        # A symbol is still missing (e.g. the rebuild compiled old sources):
        # honor the contract — callers fall back to the numpy paths.
        _BUILD_FAILED = True
        return None
    _LIB = lib
    return _LIB


def native_kdtree_available() -> bool:
    return _load() is not None


def _f64(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64)


class NativeKDTree:
    """Median-split KD-tree over [n, d] float64 points (squared-L2 k-NN +
    mutual-reachability Boruvka MST), OpenMP-parallel queries."""

    def __init__(self, points: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native kdtree library unavailable (build failed)")
        self._lib = lib
        pts = _f64(np.atleast_2d(points))
        self.n, self.dim = pts.shape
        self._pts = pts  # keep alive until kd_build copies... (copies at build)
        self._h = lib.kd_build(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(self.n), ctypes.c_int(self.dim),
        )

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.kd_free(h)
            self._h = None

    def knn(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """k nearest neighbors per query: ([nq, k] indices, [nq, k] squared
        distances), ascending; index -1 / inf pads where k > n."""
        q = _f64(np.atleast_2d(queries))
        nq = q.shape[0]
        assert q.shape[1] == self.dim
        # k < 1 is undefined behavior in the C++ heap (push reads d2[0] of a
        # zero-length buffer); fail loudly here instead.
        if k < 1:
            raise ValueError(f"knn requires k >= 1, got {k}")
        idx = np.empty((nq, k), dtype=np.int64)
        d2 = np.empty((nq, k), dtype=np.float64)
        self._lib.kd_knn(
            self._h,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(nq), ctypes.c_int(k),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            d2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return idx, d2

    def mst_mutual_reachability(self, core: np.ndarray) -> np.ndarray:
        """Exact MST of mr(a,b) = max(core_a, core_b, ||a-b||): [n-1, 3] rows
        (a, b, weight)."""
        c = _f64(core).reshape(-1)
        assert c.shape[0] == self.n
        a = np.empty(max(self.n - 1, 1), dtype=np.int64)
        b = np.empty(max(self.n - 1, 1), dtype=np.int64)
        w = np.empty(max(self.n - 1, 1), dtype=np.float64)
        m = self._lib.kd_mst_mutual_reachability(
            self._h,
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return np.column_stack([a[:m].astype(np.float64), b[:m].astype(np.float64), w[:m]])


def single_linkage_native(edges: np.ndarray, n: int) -> Optional[np.ndarray]:
    """Union-find single linkage over the [n-1, 3] (a, b, weight) MST edges of
    an n-point hierarchy -> [n-1, 4] merge rows (root_a, root_b, weight,
    size), or None when the native library is unavailable. Exact match of the
    Python fallback (stable weight sort, merge-order internal node ids).

    Requires a complete spanning tree: internal node ids are n..2n-2, so an
    edge list shorter than n-1 (disconnected input, e.g. NaN coordinates)
    would silently shift every id — rejected here instead.
    """
    lib = _load()
    if lib is None:
        return None
    edges = np.asarray(edges)
    m = edges.shape[0]
    if m != n - 1:
        raise ValueError(
            f"single linkage needs the complete MST: got {m} edges for n={n} "
            "points (disconnected input, e.g. non-finite coordinates)"
        )
    if m == 0:
        return np.empty((0, 4), dtype=np.float64)
    ea = np.ascontiguousarray(edges[:, 0], dtype=np.int64)
    eb = np.ascontiguousarray(edges[:, 1], dtype=np.int64)
    ew = _f64(edges[:, 2])
    out = np.empty((m, 4), dtype=np.float64)
    lib.kd_single_linkage(
        ea.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        eb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ew.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
