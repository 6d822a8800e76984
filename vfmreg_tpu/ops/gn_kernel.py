"""Pallas kernel: one fused GN iteration over the champion NN cache.

A geometric-ICP iteration is, per query point: distance to its <=32 cached
per-voxel champions -> arg-min -> max-distance acceptance gate -> Geman-
McClure weight -> accumulate the robust normal equations. As stock XLA this
is a Pallas NN kernel + one-hot selects + two einsums with [N, K] and
[N, 3, 6] intermediates round-tripping HBM (~8 ms at 16k queries); fused it
is ONE streaming pass over the cache (~6 MB -> tens of microseconds of HBM
time), emitting 17 partial sums per block.

The cache arrives TRANSPOSED ([K, N]: champions in sublanes, queries in
lanes) so the candidate reduction runs across sublanes and the query axis
fills full 128-lane tiles.

Closed-form normal equations for J_i = [I | -hat(s_c_i)], r_i = s_i - b_i
(`registration/icp.py build_linear_system`, reference
`core/Registration.cpp:96-140`):
  JTr  = [ sum w r,  sum w (s_c x r) ]
  JTJ  = [[ (sum w) I3,          -hat(sum w s_c)       ],
          [  hat(sum w s_c),      sum w (|s_c|^2 I - s_c s_c^T) ]]
so the kernel accumulates count, sum w, sum w s_c (3), sum w s_c s_c^T
(6 unique), sum w r (3), sum w s_c x r (3) = 17 scalars per block; the 6x6
system is assembled on the host side of the jit from the block partials.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NPART = 24  # 17 partial sums padded to a multiple of 8 sublanes


def _kernel(scal_ref, cx_ref, cy_ref, cz_ref, sx_ref, sy_ref, sz_ref, out_ref):
    # scal: [1, 8] = (center x, y, z, kernel, max_dist2, 0, 0, 0)
    cxq, cyq, czq = scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2]
    kernel = scal_ref[0, 3]
    max_d2 = scal_ref[0, 4]

    sx = sx_ref[...]  # [1, BQ]
    sy = sy_ref[...]
    sz = sz_ref[...]
    dx = cx_ref[...] - sx  # [K, BQ]; sentinel coords overflow d2 to +inf
    dy = cy_ref[...] - sy
    dz = cz_ref[...] - sz
    d2 = dx * dx + dy * dy + dz * dz
    best = jnp.min(d2, axis=0, keepdims=True)  # [1, BQ]

    # Lowest-index tie-break, then one-hot champion coordinate selection.
    k_iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    ksel = jnp.min(jnp.where(d2 == best, k_iota, jnp.int32(2**30)), axis=0, keepdims=True)
    onehot = k_iota == ksel
    bx = jnp.sum(jnp.where(onehot, cx_ref[...], 0.0), axis=0, keepdims=True)
    by = jnp.sum(jnp.where(onehot, cy_ref[...], 0.0), axis=0, keepdims=True)
    bz = jnp.sum(jnp.where(onehot, cz_ref[...], 0.0), axis=0, keepdims=True)

    accept = best < max_d2  # +inf (empty/masked) never accepts
    w = jnp.where(accept, (kernel * kernel) / jnp.square(kernel + best), 0.0)

    # where() (not multiplication) so sentinel/NaN lanes cannot poison sums.
    rx = jnp.where(accept, sx - bx, 0.0)
    ry = jnp.where(accept, sy - by, 0.0)
    rz = jnp.where(accept, sz - bz, 0.0)
    px = jnp.where(accept, sx - cxq, 0.0)  # s_c
    py = jnp.where(accept, sy - cyq, 0.0)
    pz = jnp.where(accept, sz - czq, 0.0)

    parts = [
        accept.astype(jnp.float32),  # 0: count
        w,  # 1: sum w
        w * px, w * py, w * pz,  # 2-4: sum w s_c
        w * px * px, w * py * py, w * pz * pz,  # 5-7: diag s_c s_c^T
        w * px * py, w * px * pz, w * py * pz,  # 8-10: off-diag
        w * rx, w * ry, w * rz,  # 11-13: sum w r
        w * (py * rz - pz * ry),  # 14-16: sum w (s_c x r)
        w * (pz * rx - px * rz),
        w * (px * ry - py * rx),
    ]
    acc = jnp.concatenate(parts, axis=0)  # [17, BQ]
    acc = jnp.pad(acc, ((0, _NPART - len(parts)), (0, 0)))
    sums = jnp.sum(acc, axis=1, keepdims=True)  # [NPART, 1]
    # Revisited output block: lane 0 accumulates across grid steps (the TPU
    # grid is sequential, so read-modify-write is race-free).
    block = jnp.pad(sums, ((0, 0), (0, 127)))  # [NPART, 128]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += block


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def gn_moments_from_cache(
    cx: jnp.ndarray,  # [K, N] champion x (sentinel 2e19 in dead lanes)
    cy: jnp.ndarray,
    cz: jnp.ndarray,
    source: jnp.ndarray,  # [N, 3] current source positions
    center: jnp.ndarray,  # [3]
    kernel,
    max_dist,
    block_q: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """[17] moment vector (see module docstring) in one cache pass."""
    k, n = cx.shape
    pad_q = (-n) % block_q
    st = source.astype(jnp.float32).T  # [3, N]
    if pad_q:
        # Padded queries get sentinel champions -> best=+inf -> zero weight.
        cx = jnp.pad(cx, ((0, 0), (0, pad_q)), constant_values=2e19)
        cy = jnp.pad(cy, ((0, 0), (0, pad_q)), constant_values=2e19)
        cz = jnp.pad(cz, ((0, 0), (0, pad_q)), constant_values=2e19)
        st = jnp.pad(st, ((0, 0), (0, pad_q)))
    sx, sy, sz = st[0:1], st[1:2], st[2:3]
    scal = jnp.concatenate(
        [
            center.astype(jnp.float32).reshape(3),
            jnp.asarray(kernel, jnp.float32).reshape(1),
            jnp.square(jnp.asarray(max_dist, jnp.float32)).reshape(1),
            jnp.zeros((3,), jnp.float32),
        ]
    ).reshape(1, 8)

    grid = (n + pad_q) // block_q
    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0)),
            pl.BlockSpec((k, block_q), lambda i: (0, i)),
            pl.BlockSpec((k, block_q), lambda i: (0, i)),
            pl.BlockSpec((k, block_q), lambda i: (0, i)),
            pl.BlockSpec((1, block_q), lambda i: (0, i)),
            pl.BlockSpec((1, block_q), lambda i: (0, i)),
            pl.BlockSpec((1, block_q), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((_NPART, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((_NPART, 128), jnp.float32),
        interpret=interpret,
    )(scal, cx, cy, cz, sx, sy, sz)
    return out[:17, 0]


def assemble_gn_system(m: jnp.ndarray):
    """17 moments -> (JTJ [6, 6], JTr [6], n_corr) matching
    `build_linear_system` exactly."""
    count, sw = m[0], m[1]
    s1 = m[2:5]  # sum w s_c
    sxx, syy, szz, sxy, sxz, syz = m[5], m[6], m[7], m[8], m[9], m[10]
    wr = m[11:14]
    wcx = m[14:17]

    def hat(v):
        return jnp.array(
            [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]],
            dtype=jnp.float32,
        )

    S2 = jnp.array(
        [[sxx, sxy, sxz], [sxy, syy, syz], [sxz, syz, szz]], dtype=jnp.float32
    )
    tr = sxx + syy + szz
    JTJ = jnp.zeros((6, 6), jnp.float32)
    JTJ = JTJ.at[:3, :3].set(sw * jnp.eye(3, dtype=jnp.float32))
    JTJ = JTJ.at[:3, 3:].set(-hat(s1))
    JTJ = JTJ.at[3:, :3].set(hat(s1))
    JTJ = JTJ.at[3:, 3:].set(tr * jnp.eye(3, dtype=jnp.float32) - S2)
    JTr = jnp.concatenate([wr, wcx])
    return JTJ, JTr, count.astype(jnp.int32)
