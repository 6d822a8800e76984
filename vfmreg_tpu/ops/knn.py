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

from vfmreg_tpu.ops.hash_grid import HashGrid


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
    from vfmreg_tpu.ops.hash_grid import gather_candidate_slabs

    n = queries.shape[0]
    radius2 = jnp.square(jnp.asarray(radius, jnp.float32))

    # [N, 27*S*32] candidates from the bucket-aligned slab store (sentinel
    # lanes carry +inf distances and out-of-range row ids).
    cands = gather_candidate_slabs(grid, queries, query_mask)
    xs, ys, zs = cands.coords()
    dx = xs - queries[:, None, 0:1]
    dy = ys - queries[:, None, 1:2]
    dz = zs - queries[:, None, 2:3]
    d2_all = (dx * dx + dy * dy + dz * dz).reshape(n, -1)
    idx_all = jnp.clip(cands.row_global(), 0, grid.points.shape[0] - 1)

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
