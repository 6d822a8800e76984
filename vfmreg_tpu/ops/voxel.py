"""Voxelization primitives as fixed-shape masked JAX ops.

TPU-first re-design of the reference's ragged host-side voxel ops
(`core/Preprocessing.cpp:50-197`, `core/VoxelHashMap.cpp:733-770`):

* Point clouds are `(points[N,3], mask[N])` (+ optional `feats[N,D]`) — padded,
  static-shape arrays; "removing" points flips mask bits, "filtering" compacts the
  survivors to the front with a stable sort.
* First-point-wins voxel downsampling (reference semantics: insertion order wins,
  `Preprocessing.cpp:55-61`) becomes: stable sort by 32-bit voxel hash, detect run
  starts, keep the first point of each run. Stability of the sort makes "first in
  input order" the representative, matching the C++ insertion-order semantics.
* Voxel coordinates use C-style truncation toward zero (`static_cast<int>` in
  `Preprocessing.cpp:58`, `VoxelHashMap.cpp:80-82`) — NOT floor — for parity.

Hash-collision note: points are grouped by the full 32-bit spatial hash and runs are
split wherever consecutive sorted coords differ, so two colliding voxels at worst
yield a duplicate representative (never a dropped one) in the rare case their points
interleave in input order. Expected extra points ~ U^2 / 2^33 per call (<<1e-3 for
typical map sizes); recall-level parity is unaffected.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

# numpy (not jnp) constant: a module-level device array would initialize the
# jax backend at import time — which HANGS every CLI/import before it can
# force the CPU platform when the remote-TPU tunnel is down.
INVALID_HASH = np.uint32(0xFFFFFFFF)


def voxel_coords(points: jnp.ndarray, voxel_size) -> jnp.ndarray:
    """Integer voxel coordinates with C-truncation semantics. (..., 3) f32 -> int32."""
    return jnp.trunc(points / voxel_size).astype(jnp.int32)


def voxel_hash(coords: jnp.ndarray) -> jnp.ndarray:
    """32-bit spatial hash of int32 voxel coords (..., 3) -> uint32.

    Unlike the reference's Teschner XOR-multiply hash (`VoxelHashMap.hpp:72-77`,
    only used for robin_map bucketing there, with full-key compares), this hash IS
    the grouping key on device, so it needs genuine ~2^-32 collision behavior for
    small coordinate ranges. Multiplicative chain + murmur3 fmix32 finalizer gives
    full avalanche (the Teschner hash collides at ~1e-1 rates for |coord| < 20).
    """
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(0x9E3779B1)
    h = (h + c[..., 1]) * jnp.uint32(0x85EBCA77)
    h = (h + c[..., 2]) * jnp.uint32(0xC2B2AE3D)
    # murmur3 fmix32
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def compact_by_mask(
    mask: jnp.ndarray, *arrays: jnp.ndarray
) -> Tuple[jnp.ndarray, ...]:
    """Stable-compact selected rows to the front. Returns (new_mask_sorted, *gathered).

    new_mask is True for the first sum(mask) rows.
    """
    order = jnp.argsort(~mask, stable=True)
    out = tuple(a[order] for a in arrays)
    return (mask[order],) + out


def voxel_down_sample_masked(
    points: jnp.ndarray,
    voxel_size,
    mask: Optional[jnp.ndarray] = None,
    feats: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """First-point-wins voxel downsample on padded arrays.

    Args:
      points: [N, 3] float32 (rows beyond mask are ignored).
      voxel_size: scalar voxel edge length.
      mask: [N] bool validity (default: all valid).
      feats: optional [N, D] carried alongside (the reference's VectorNd/VectorXd
        overloads, `Preprocessing.cpp:95-137`).

    Returns:
      (points_out[N,3], feats_out[N,D] or None, mask_out[N]) with the selected
      representatives compacted to the front; mask_out marks them.
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)

    coords = voxel_coords(points, voxel_size)
    h = voxel_hash(coords)
    h = jnp.where(mask, h, INVALID_HASH)

    order = jnp.argsort(h, stable=True)
    h_s = h[order]
    coords_s = coords[order]
    mask_s = mask[order]

    # Run starts: first row, hash change, or coordinate change (collision split).
    prev_same = jnp.concatenate(
        [
            jnp.zeros((1,), dtype=bool),
            (h_s[1:] == h_s[:-1]) & jnp.all(coords_s[1:] == coords_s[:-1], axis=-1),
        ]
    )
    selected = mask_s & ~prev_same

    # Map the selection back to ORIGINAL row order before compacting: chained
    # downsamples (the driver's 0.1 -> 0.5v -> 1.0v -> 5 m device chain) must
    # apply first-wins in INSERTION order at every stage, exactly like the
    # reference's host chain — a hash-ordered intermediate would make the next
    # stage pick a hash-first (not insertion-first) representative. One extra
    # int32 argsort; keeps the op scatter-free.
    inv = jnp.argsort(order)
    sel_orig = selected[inv]

    arrays = (points,) if feats is None else (points, feats)
    compacted = compact_by_mask(sel_orig, *arrays)
    mask_out = compacted[0]
    pts_out = compacted[1]
    feats_out = compacted[2] if feats is not None else None
    return pts_out, feats_out, mask_out


def range_crop_masked(
    points: jnp.ndarray,
    max_range: float,
    min_range: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """min/max-range crop about the sensor origin (`Preprocessing.cpp:139-197`).

    Purely a mask update — no compaction (callers compact when they need to).
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    norm = jnp.linalg.norm(points, axis=-1)
    return mask & (norm < max_range) & (norm > min_range)


def correct_kitti_scan(points: jnp.ndarray) -> jnp.ndarray:
    """KITTI vertical-angle correction (`Preprocessing.cpp:199-209`).

    Rotates each point by 0.205 deg about the axis (p x z)/|p x z|.
    """
    offset = jnp.asarray(0.205 * jnp.pi / 180.0, dtype=points.dtype)
    z = jnp.array([0.0, 0.0, 1.0], dtype=points.dtype)
    axis = jnp.cross(points, z)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    # Rodrigues rotation of p about `axis` by `offset`.
    cos_t = jnp.cos(offset)
    sin_t = jnp.sin(offset)
    return (
        points * cos_t
        + jnp.cross(axis, points) * sin_t
        + axis * jnp.sum(axis * points, axis=-1, keepdims=True) * (1.0 - cos_t)
    )


def pad_to(points: jnp.ndarray, n: int, axis: int = 0) -> jnp.ndarray:
    """Zero-pad an array along `axis` to length n (host-side shape bucketing helper)."""
    pad = n - points.shape[axis]
    if pad < 0:
        raise ValueError(f"Cannot pad {points.shape[axis]} down to {n}")
    widths = [(0, 0)] * points.ndim
    widths[axis] = (0, pad)
    return jnp.pad(points, widths)


def bucket_size(n: int, base: int = 512) -> int:
    """Static shape bucket: smallest base*2^k >= n (limits recompilation count)."""
    size = base
    while size < n:
        size *= 2
    return size
