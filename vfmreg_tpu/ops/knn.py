"""Radius-limited k-NN on the voxel hash grid.

Used by FPFH (normal estimation + SPFH neighborhoods), DIP/GeDi patch
extraction, and the cluster-removal experiment. Replaces Open3D's
`KDTreeSearchParamHybrid` and pointnet2's `ball_query` with a fixed-shape
27-neighborhood candidate gather + top-k.

Approximation note: candidates are limited to `27 * max_points_per_voxel` grid
entries around the query (build the grid with a larger cap for dense clouds);
the radius must not exceed the grid voxel size for full coverage of the ball.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vfmreg_tpu.ops.hash_grid import HashGrid, _NEIGHBOR_OFFSETS, _lookup_buckets
from vfmreg_tpu.ops.voxel import INVALID_HASH, voxel_coords, voxel_hash


class RadiusKNN(NamedTuple):
    idx: jnp.ndarray  # [N, k] indices into grid.points (sorted order)
    dist: jnp.ndarray  # [N, k]
    mask: jnp.ndarray  # [N, k] valid neighbor (within radius)


@partial(jax.jit, static_argnames=("k", "exclude_self"))
def radius_knn(
    grid: HashGrid,
    queries: jnp.ndarray,
    query_mask: jnp.ndarray,
    k: int,
    radius,
    exclude_self: bool = False,
) -> RadiusKNN:
    """k nearest grid points within `radius` of each query (hybrid search).

    `exclude_self=True` drops exact-zero-distance hits (self matches when the
    queries are the grid points themselves).
    """
    n = queries.shape[0]
    cap = grid.max_points_per_voxel
    base = voxel_coords(queries, grid.voxel_size)
    radius2 = jnp.square(jnp.asarray(radius, jnp.float32))

    def gather_offset(o):
        h = voxel_hash(base + _NEIGHBOR_OFFSETS[o])
        h = jnp.where(query_mask, h, INVALID_HASH)
        start, count = _lookup_buckets(grid, h)
        slot = jnp.arange(cap, dtype=jnp.int32)
        idx = jnp.clip(start[:, None] + slot[None, :], 0, grid.points.shape[0] - 1)
        ok = slot[None, :] < count[:, None]
        cand = grid.points[idx]
        d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(ok, d2, jnp.inf)
        return idx, d2

    # [N, 27*cap] candidates; vectorized over the 27 offsets.
    idx_all, d2_all = jax.vmap(gather_offset, out_axes=(1, 1))(jnp.arange(27))
    idx_all = idx_all.reshape(n, 27 * cap)
    d2_all = d2_all.reshape(n, 27 * cap)

    within = d2_all <= radius2
    if exclude_self:
        within = within & (d2_all > 1e-12)
    d2_all = jnp.where(within, d2_all, jnp.inf)

    neg = -d2_all  # top_k takes maxima
    top_vals, top_pos = jax.lax.top_k(neg, k)
    top_d2 = -top_vals
    top_idx = jnp.take_along_axis(idx_all, top_pos, axis=1)
    valid = jnp.isfinite(top_d2) & query_mask[:, None]
    return RadiusKNN(
        idx=top_idx,
        dist=jnp.sqrt(jnp.where(valid, top_d2, jnp.inf)),
        mask=valid,
    )
