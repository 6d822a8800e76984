"""Pallas kernel: fused masked nearest-neighbor over the champion cache.

The cached-NN step inside the ICP GN loop (see `registration.icp`) is, per
query, a squared-distance + arg-min over its <=32 per-voxel champions. The
cache is stored TRANSPOSED ([K, N]: champions in sublanes, queries in lanes,
see `hash_grid.NNCache`), so the reduction runs across sublanes and the query
axis fills full 128-lane tiles; fused, an NN resolve is one streaming pass
over the ~6 MB cache.

Invalid candidates carry the `INVALID_COORD` sentinel whose squared distances
overflow f32 to +inf — no mask array is streamed. Output is the best
candidate's squared distance and champion index (lowest index among ties).

Replaces the per-query 27-voxel scan of the reference `GetClosestNeighbor`
(`core/VoxelHashMap.cpp:79-134`) between candidate-cache refreshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BIG_ROW = 2**30
# Invalid-candidate coordinate sentinel: squares overflow f32 to +inf.
INVALID_COORD = 2e19


def _kernel(cx_ref, cy_ref, cz_ref, sx_ref, sy_ref, sz_ref, d2_ref, k_ref):
    dx = cx_ref[...] - sx_ref[...]  # [K, BQ] - [1, BQ]
    dy = cy_ref[...] - sy_ref[...]
    dz = cz_ref[...] - sz_ref[...]
    d2 = dx * dx + dy * dy + dz * dz
    best = jnp.min(d2, axis=0, keepdims=True)  # [1, BQ]
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    ksel = jnp.where(d2 == best, iota, jnp.int32(_BIG_ROW))
    d2_ref[...] = best
    k_ref[...] = jnp.min(ksel, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def nn_argmin(
    cx: jnp.ndarray,  # [K, N] candidate x (invalid entries = sentinel)
    cy: jnp.ndarray,  # [K, N]
    cz: jnp.ndarray,  # [K, N]
    queries: jnp.ndarray,  # [N, 3]
    block_q: int = 2048,
    interpret: bool = False,
):
    """(best_d2 [N] f32, +inf when the neighborhood is empty; best_k [N] i32
    champion index — lowest index among ties)."""
    k, n = cx.shape
    pad_q = (-n) % block_q
    st = queries.astype(jnp.float32).T  # [3, N]
    if pad_q:
        cx = jnp.pad(cx, ((0, 0), (0, pad_q)), constant_values=INVALID_COORD)
        cy = jnp.pad(cy, ((0, 0), (0, pad_q)), constant_values=INVALID_COORD)
        cz = jnp.pad(cz, ((0, 0), (0, pad_q)), constant_values=INVALID_COORD)
        st = jnp.pad(st, ((0, 0), (0, pad_q)))
    sx, sy, sz = st[0:1], st[1:2], st[2:3]

    grid = (n + pad_q) // block_q
    spec_c = pl.BlockSpec((k, block_q), lambda i: (0, i))
    spec_q = pl.BlockSpec((1, block_q), lambda i: (0, i))
    d2, kk = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[spec_c, spec_c, spec_c, spec_q, spec_q, spec_q],
        out_specs=[spec_q, spec_q],
        out_shape=[
            jax.ShapeDtypeStruct((1, n + pad_q), jnp.float32),
            jax.ShapeDtypeStruct((1, n + pad_q), jnp.int32),
        ],
        interpret=interpret,
    )(cx, cy, cz, sx, sy, sz)
    return d2[0, :n], kk[0, :n]
