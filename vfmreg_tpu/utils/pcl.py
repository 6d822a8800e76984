"""Point-cloud utilities — `vfm_reg/utils.py` minus ROS.

`transform_pcl` (`utils.py:47-54`) transforms xyz and carries descriptor columns.
`KNeighbors` replaces `FaissKNeighbors` (`utils.py:19-44`) with the repo's own
native KD-tree (`native/kdtree.cpp`), reproducing faiss `IndexFlatL2`
semantics exactly: SQUARED L2 distances, zero-distance (self/duplicate) hits
excluded, `query` strict `d2 < r` vs `n_neighbors_in_radius` inclusive
`d2 <= r`. These run on ragged host data in the cluster-removal experiment;
the hot matching paths use `ops.matching` on device. A chunked numpy
brute-force path covers toolchains without a C++ compiler.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def transform_pcl(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    pts = np.asarray(points)
    xyz = pts[:, :3] @ np.asarray(transform)[:3, :3].T + np.asarray(transform)[:3, 3]
    if pts.shape[1] > 3:
        return np.c_[xyz.astype(pts.dtype), pts[:, 3:]]
    return xyz.astype(pts.dtype)


def _brute_knn(data: np.ndarray, queries: np.ndarray, k: int, chunk: int = 1024):
    """Chunked brute-force k-NN fallback: ([nq, k] idx, [nq, k] squared d2)."""
    nq = queries.shape[0]
    idx = np.empty((nq, k), dtype=np.int64)
    d2 = np.empty((nq, k), dtype=np.float64)
    for b in range(0, nq, chunk):
        q = queries[b : b + chunk]
        dist2 = (
            np.sum(q * q, axis=1)[:, None]
            - 2.0 * q @ data.T
            + np.sum(data * data, axis=1)[None, :]
        )
        np.maximum(dist2, 0.0, out=dist2)
        part = np.argpartition(dist2, k - 1, axis=1)[:, :k]
        pd = np.take_along_axis(dist2, part, axis=1)
        order = np.argsort(pd, axis=1, kind="stable")
        idx[b : b + chunk] = np.take_along_axis(part, order, axis=1)
        d2[b : b + chunk] = np.take_along_axis(pd, order, axis=1)
    return idx, d2


class KNeighbors:
    """API clone of FaissKNeighbors (`utils.py:19-44`), native-KD-tree backed."""

    def __init__(self, k: int = 5):
        self.k = k
        self._tree = None
        self._data: Optional[np.ndarray] = None
        self._payload: Optional[np.ndarray] = None

    def fit(self, X: np.ndarray, y: Optional[np.ndarray] = None):
        # faiss indexes float32 copies; keep that quantization for parity.
        data = np.ascontiguousarray(X, dtype=np.float32).astype(np.float64)
        from vfmreg_tpu.native.kdtree import NativeKDTree, native_kdtree_available

        self._data = data
        self._tree = NativeKDTree(data) if native_kdtree_available() else None
        self._payload = np.arange(X.shape[0]) if y is None else np.asarray(y)
        return self

    def _knn(self, X: np.ndarray, k: int):
        q = np.ascontiguousarray(X, dtype=np.float32).astype(np.float64)
        k = min(k, self._data.shape[0])
        if self._tree is not None:
            return self._tree.knn(q, k)
        return _brute_knn(self._data, q, k)

    def query(self, X: np.ndarray, k: int, r: float) -> np.ndarray:
        """Payload values of up to k neighbors with 0 < squared-distance < r,
        flattened and deduplicated (`utils.py:30-38`; used by the region
        growth at `registration_node.py:713-715`)."""
        idx, d2 = self._knn(X, k)
        idx, d2 = idx.ravel(), d2.ravel()
        keep = (d2 > 0.0) & (d2 < r)
        return np.unique(self._payload[idx[keep]])

    def n_neighbors_in_radius(self, X: np.ndarray, k: int, r: float) -> np.ndarray:
        """Per query, the number of neighbors with 0 < squared-distance <= r,
        capped at k (`utils.py:39-44`)."""
        _, d2 = self._knn(X, k)
        return np.sum((d2 > 0.0) & (d2 <= r), axis=1)
