"""Pallas kernel: fused masked nearest-neighbor over a cached candidate set.

The cached-NN step inside the ICP GN loop (see `registration.icp`) is, per
query, a masked squared-distance + arg-min over its K≈864 gathered candidates.
As stock XLA this runs several HBM passes over the [N, K] intermediates
(~3 ms at 16k queries x 864 on v5e); fused, it is one streaming pass over the
candidate arrays (~0.5 ms floor).

Inputs are the SoA candidate cache built by `hash_grid.build_nn_cache`
(coordinates [N, K] per axis, validity, global row ids). Output is the best
candidate's global row and squared distance; the caller gathers the winning
point from `grid.points` (an N-row gather) and applies masks.

Replaces the per-query 27-voxel scan of the reference `GetClosestNeighbor`
(`core/VoxelHashMap.cpp:79-134`) between candidate-cache refreshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_ROW = 2**30
# Invalid-candidate coordinate sentinel: squares overflow f32 to +inf.
INVALID_COORD = 2e19


def _kernel(cx_ref, cy_ref, cz_ref, q_ref, d2_ref, k_ref):
    q = q_ref[...]  # [BQ, 3]
    dx = cx_ref[...] - q[:, 0][:, None]
    dy = cy_ref[...] - q[:, 1][:, None]
    dz = cz_ref[...] - q[:, 2][:, None]
    d2 = dx * dx + dy * dy + dz * dz  # [BQ, K]; invalid candidates carry
    # sentinel coordinates (2e19) whose squares overflow to +inf — no mask read.
    best = jnp.min(d2, axis=1)  # [BQ]
    # Arg-min without gathers: lowest candidate index among the minima.
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    ksel = jnp.where(d2 == best[:, None], iota, jnp.int32(_BIG_ROW))
    d2_ref[...] = best[:, None]
    k_ref[...] = jnp.min(ksel, axis=1)[:, None]


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def nn_argmin(
    cx: jnp.ndarray,  # [N, K] candidate x (SoA; invalid entries = 2e19 sentinel)
    cy: jnp.ndarray,  # [N, K]
    cz: jnp.ndarray,  # [N, K]
    queries: jnp.ndarray,  # [N, 3]
    block_q: int = 256,
    interpret: bool = False,
):
    """(best_d2 [N] f32, +inf when the neighborhood is empty; best_k [N] i32
    candidate index — lowest index among ties)."""
    n, k = cx.shape
    pad_q = (-n) % block_q
    pad_k = (-k) % 128
    if pad_q or pad_k:
        # The ICP hot path passes pre-padded caches (`build_nn_cache`), so this
        # copy only triggers for ad-hoc callers. Padding uses the sentinel so
        # padded columns never win.
        pad2 = ((0, pad_q), (0, pad_k))
        cx = jnp.pad(cx, pad2, constant_values=INVALID_COORD)
        cy = jnp.pad(cy, pad2, constant_values=INVALID_COORD)
        cz = jnp.pad(cz, pad2, constant_values=INVALID_COORD)
    q = jnp.pad(queries.astype(jnp.float32), ((0, pad_q), (0, 0)))
    np_, kp = cx.shape

    spec = pl.BlockSpec((block_q, kp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((block_q, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((block_q, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    best_d2, best_k = pl.pallas_call(
        _kernel,
        grid=(np_ // block_q,),
        in_specs=[spec, spec, spec, qspec],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        ),
        interpret=interpret,
    )(cx, cy, cz, q)
    return best_d2[:n, 0], best_k[:n, 0]
