"""Point-cloud utilities — `vfm_reg/utils.py` minus ROS.

`transform_pcl` (`utils.py:47-54`) transforms xyz and carries descriptor columns.
`KNeighbors` replaces `FaissKNeighbors` (`utils.py:19-44`): flat-L2 k-NN with
index payloads, radius-limited queries and radius neighbor counts — scikit-learn
backed on host (these run on ragged host data in the cluster-removal experiment;
the hot matching paths use `ops.matching` on device).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from sklearn.neighbors import NearestNeighbors


def transform_pcl(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    pts = np.asarray(points)
    xyz = pts[:, :3] @ np.asarray(transform)[:3, :3].T + np.asarray(transform)[:3, 3]
    if pts.shape[1] > 3:
        return np.c_[xyz.astype(pts.dtype), pts[:, 3:]]
    return xyz.astype(pts.dtype)


class KNeighbors:
    """API clone of FaissKNeighbors (`utils.py:19-44`)."""

    def __init__(self, k: int = 5):
        self.k = k
        self._nn: Optional[NearestNeighbors] = None
        self._payload: Optional[np.ndarray] = None

    def fit(self, X: np.ndarray, y: Optional[np.ndarray] = None):
        self._nn = NearestNeighbors(algorithm="auto").fit(np.ascontiguousarray(X))
        self._payload = np.arange(X.shape[0]) if y is None else np.asarray(y)
        return self

    def query(self, X: np.ndarray, k: int, max_distance: float) -> np.ndarray:
        """Indices (payload values) of up to k neighbors within max_distance,
        flattened and deduplicated — matches the FaissKNeighbors usage at
        `registration_node.py:713-715`."""
        k = min(k, self._payload.shape[0])
        dist, idx = self._nn.kneighbors(np.ascontiguousarray(X), n_neighbors=k)
        keep = dist <= max_distance
        return np.unique(self._payload[idx[keep]])

    def n_neighbors_in_radius(self, X: np.ndarray, k: int, radius: float) -> np.ndarray:
        """Number of neighbors within `radius` (capped at k) per query
        (`utils.py:36-44` counts faiss range_search hits)."""
        k = min(k, self._payload.shape[0])
        dist, _ = self._nn.kneighbors(np.ascontiguousarray(X), n_neighbors=k)
        return np.sum(dist <= radius, axis=1)
