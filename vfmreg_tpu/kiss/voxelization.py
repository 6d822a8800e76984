"""Host-facing voxel downsampling with the reference signature.

`voxel_down_sample(points, voxel_size)` accepts [N, 3] or [N, 3+D] numpy arrays
and returns the first-point-per-voxel subsample, like
`kiss_icp/voxelization.py:27-39` (which shape-dispatches to the C++
`_voxel_down_sample` overloads). Implemented in numpy on the host — this is ragged
preprocessing, not the hot path; the device pipeline uses
`ops.voxel.voxel_down_sample_masked` directly.
"""

from __future__ import annotations

import numpy as np


def _voxel_keys(points: np.ndarray, voxel_size: float) -> np.ndarray:
    coords = np.trunc(points[:, :3] / voxel_size).astype(np.int64)
    # 64-bit mixing of the three coords (exact: no collisions for |coord| < 2^20).
    return (
        (coords[:, 0] + (1 << 20)).astype(np.int64)
        | ((coords[:, 1] + (1 << 20)).astype(np.int64) << 21)
        | ((coords[:, 2] + (1 << 20)).astype(np.int64) << 42)
    )


def voxel_down_sample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """First-point-wins voxel downsample (`Preprocessing.cpp:50-137` semantics)."""
    points = np.asarray(points)
    if points.ndim != 2 or points.shape[1] < 3:
        raise ValueError(f"Expected [N, >=3] points, got {points.shape}")
    if points.shape[0] == 0:
        return points
    keys = _voxel_keys(points, voxel_size)
    # First occurrence per key, in insertion order.
    _, first_idx = np.unique(keys, return_index=True)
    return points[np.sort(first_idx)]
