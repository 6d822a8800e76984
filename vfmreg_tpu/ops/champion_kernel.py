"""Pallas kernel: single-pass champion-cache rebuild from transposed candidates.

The ICP GN loop rebuilds its per-voxel-champion cache (`hash_grid.NNCache`)
every time a lane wants to confirm convergence — tens of times per epoch in
practice (a lane whose |dx| hovers at the 1e-4 threshold re-confirms every few
iterations). As stock XLA (`hash_grid.build_nn_cache`) each rebuild makes ~3
passes over the gathered candidate set (d2 + arg-min + four one-hot selects on
[N, 27, 32] intermediates) — ~5 ms at the production scale where a GN
iteration itself costs ~0.1 ms, making rebuilds the dominant cost of the
driver's vanilla-ICP row (measured 540 of 940 ms at B=16).

This kernel is ONE streaming pass: candidates arrive TRANSPOSED
([27*G, N]: per-voxel candidate groups in sublanes, queries in lanes — the
same orientation trick as `nn_kernel`/`gn_kernel`), each 32-sublane-aligned
group reduces to its voxel champion in registers, and only the [32, N]
champion planes are written. G is the per-voxel candidate count rounded up to
the sublane tile (cap=20 -> G=24), so the pass also skips the slab store's
sentinel padding lanes (25% less HBM traffic than the [*, 32] layout).

Champion selection is bit-identical to `build_nn_cache`: same f32 squared
distance, lowest-candidate-index tie-break, +inf sentinel semantics, same
alive/mask gating. `NNCache.rows` is zero-filled — the geometric path never
reads it (`parallel/mesh.py` map-sharded docstring); the weighted XD path
keeps its own cache builder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vfmreg_tpu.ops.nn_kernel import INVALID_COORD

_BIG = 2**30


def _kernel(cxt_ref, cyt_ref, czt_ref, qx_ref, qy_ref, qz_ref, qm_ref,
            ocx_ref, ocy_ref, ocz_ref, g: int):
    qx = qx_ref[...]  # [1, BQ]
    qy = qy_ref[...]
    qz = qz_ref[...]
    alive_q = qm_ref[...] > 0  # [1, BQ]
    bad = jnp.float32(INVALID_COORD)
    n_groups = cxt_ref.shape[0] // g
    for v in range(32):
        if v < n_groups:
            xs = cxt_ref[g * v : g * (v + 1), :]  # [G, BQ]
            ys = cyt_ref[g * v : g * (v + 1), :]
            zs = czt_ref[g * v : g * (v + 1), :]
            dx = xs - qx
            dy = ys - qy
            dz = zs - qz
            d2 = dx * dx + dy * dy + dz * dz  # sentinels overflow to +inf
            best = jnp.min(d2, axis=0, keepdims=True)  # [1, BQ]
            iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
            ksel = jnp.min(
                jnp.where(d2 == best, iota, jnp.int32(_BIG)), axis=0, keepdims=True
            )
            onehot = iota == ksel
            alive = jnp.isfinite(best) & alive_q  # [1, BQ]
            ocx_ref[v, :] = jnp.where(
                alive, jnp.sum(jnp.where(onehot, xs, 0.0), axis=0, keepdims=True), bad
            )[0]
            ocy_ref[v, :] = jnp.where(
                alive, jnp.sum(jnp.where(onehot, ys, 0.0), axis=0, keepdims=True), bad
            )[0]
            ocz_ref[v, :] = jnp.where(
                alive, jnp.sum(jnp.where(onehot, zs, 0.0), axis=0, keepdims=True), bad
            )[0]
        else:
            # Sentinel pad rows 27..31 (NNCache is 32 sublanes wide).
            ocx_ref[v, :] = jnp.full_like(ocx_ref[v, :], bad)
            ocy_ref[v, :] = jnp.full_like(ocy_ref[v, :], bad)
            ocz_ref[v, :] = jnp.full_like(ocz_ref[v, :], bad)


@functools.partial(jax.jit, static_argnames=("group", "block_q", "interpret"))
def champions_from_planes(
    cxt: jnp.ndarray,  # [27*G, N] candidate x, per-voxel groups of G sublanes
    cyt: jnp.ndarray,
    czt: jnp.ndarray,
    queries: jnp.ndarray,  # [N, 3] current source positions
    query_mask: jnp.ndarray,  # [N] bool
    group: int,
    block_q: int = 512,
    interpret: bool = False,
):
    """(cx, cy, cz) champion planes [32, N] — see module docstring."""
    kg, n = cxt.shape
    assert kg % group == 0 and kg // group <= 32
    block_q = min(block_q, n)
    pad_q = (-n) % block_q
    st = queries.astype(jnp.float32).T  # [3, N]
    qm = query_mask.astype(jnp.float32)[None, :]
    if pad_q:
        cxt = jnp.pad(cxt, ((0, 0), (0, pad_q)), constant_values=INVALID_COORD)
        cyt = jnp.pad(cyt, ((0, 0), (0, pad_q)), constant_values=INVALID_COORD)
        czt = jnp.pad(czt, ((0, 0), (0, pad_q)), constant_values=INVALID_COORD)
        st = jnp.pad(st, ((0, 0), (0, pad_q)))
        qm = jnp.pad(qm, ((0, 0), (0, pad_q)))
    sx, sy, sz = st[0:1], st[1:2], st[2:3]

    grid = (n + pad_q) // block_q
    spec_c = pl.BlockSpec((kg, block_q), lambda i: (0, i))
    spec_q = pl.BlockSpec((1, block_q), lambda i: (0, i))
    spec_o = pl.BlockSpec((32, block_q), lambda i: (0, i))
    out_shape = jax.ShapeDtypeStruct((32, n + pad_q), jnp.float32)
    cx, cy, cz = pl.pallas_call(
        functools.partial(_kernel, g=group),
        grid=(grid,),
        in_specs=[spec_c, spec_c, spec_c, spec_q, spec_q, spec_q, spec_q],
        out_specs=[spec_o, spec_o, spec_o],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(cxt, cyt, czt, sx, sy, sz, qm)
    return cx[:, :n], cy[:, :n], cz[:, :n]
