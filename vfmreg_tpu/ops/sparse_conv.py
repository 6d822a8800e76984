"""Gather-based sparse 3D convolution — the MinkowskiEngine replacement.

MinkowskiEngine (FCGF `fcgf/fcgf.py`, GCL `gcl/model/resunet.py`) implements
sparse convolution with hash-map kernel maps + CUDA scatter. The TPU-native
formulation: for each kernel offset k, look up the in-coordinate `c_out + o_k`
in a sorted-hash index, gather its features (zeros when absent), and accumulate
`feats_k @ W_k` — K gathers + K dense [N, C_in] x [C_in, C_out] matmuls, all
MXU-shaped, run as a `lax.scan` over offsets.

Coordinate convention matches ME: a tensor at stride s has integer coordinates
that are multiples of s; stride-2 convolutions emit coords floor-divided to the
next stride; transposed convolutions emit onto a cached coordinate set (the
U-Net skip level), connecting out y to in x when x = y - o_k.

Kernel offset ORDER (weight-conversion contract): offsets enumerate the cube
[-r, r]^3 in row-major order with the LAST axis fastest, i.e.
index = (ox+r)*e^2 + (oy+r)*e + (oz+r), e = kernel edge — ME v0.5's
`RegionIterator` odometer order for HYPER_CUBE regions (`src/kernel_region.hpp`
increments the last coordinate first). The full contract — offset order,
floor-division stride-2 coordinates, transpose connection y = x + o_k*s_out —
is pinned by `tests/test_torch_parity.py::
test_fcgf_gcl_sparse_resunet_converter_parity` against a brute-force
ME-semantics torch oracle (`tests/torch_oracles/me_resunet_oracle.py`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmreg_tpu.ops.voxel import voxel_hash


# One spatial hash for the repo: the murmur-finalized chain in ops.voxel
# (whose docstring carries the collision analysis). The hash is only a SORT
# KEY here — identity is always confirmed against the actual coordinates.
_coord_hash = voxel_hash

# numpy constant: a module-level jnp scalar would initialize the backend at
# import time (hangs imports when the remote-TPU tunnel is down).
_INVALID = np.uint32(0xFFFFFFFF)


class CoordLookup(NamedTuple):
    sorted_hash: jnp.ndarray  # [N] uint32 ascending (INVALID padding at tail)
    sorted_coords: jnp.ndarray  # [N, 3] coords per sorted slot (identity check)
    row_of_sorted: jnp.ndarray  # [N] original row per sorted slot


def build_coord_lookup(coords: jnp.ndarray, mask: jnp.ndarray) -> CoordLookup:
    h = jnp.where(mask, _coord_hash(coords), _INVALID)
    order = jnp.argsort(h, stable=True)
    return CoordLookup(
        sorted_hash=h[order],
        sorted_coords=coords[order],
        row_of_sorted=order.astype(jnp.int32),
    )


def lookup_rows(lookup: CoordLookup, coords: jnp.ndarray, valid: jnp.ndarray):
    """coords [M, 3] -> (row [M], found [M]) in the indexed coordinate set.

    The hash locates the slot; identity is confirmed on the COORDINATES over a
    4-slot window (a colliding foreign coordinate must never inject its
    feature row). A >4-way distinct-coordinate hash collision (~N^4/2^96)
    would read as absent — a dropped neighbor contribution, not corruption.
    """
    h = jnp.where(valid, _coord_hash(coords), _INVALID)
    base = jnp.searchsorted(lookup.sorted_hash, h)
    n = lookup.sorted_hash.shape[0]
    row = jnp.zeros(coords.shape[0], dtype=lookup.row_of_sorted.dtype)
    found = jnp.zeros(coords.shape[0], dtype=bool)
    for w in range(4):
        idx = jnp.minimum(base + w, n - 1)
        hit = (
            (lookup.sorted_hash[idx] == h)
            & (h != _INVALID)
            & jnp.all(lookup.sorted_coords[idx] == coords, axis=-1)
        )
        row = jnp.where(hit & ~found, lookup.row_of_sorted[idx], row)
        found = found | hit
    return row, found


def kernel_offsets(kernel_size: int, stride_units: int, order: str = "last_fastest") -> np.ndarray:
    """[K, 3] integer offsets of a cubic kernel in lattice units."""
    r = (kernel_size - 1) // 2
    rng = range(-r, r + 1)
    if order == "last_fastest":
        offs = [(i, j, k) for i in rng for j in rng for k in rng]
    else:
        offs = [(k, j, i) for i in rng for j in rng for k in rng]
    return np.asarray(offs, dtype=np.int32) * stride_units


@partial(jax.jit, static_argnames=())
def sparse_conv_apply(
    in_feats: jnp.ndarray,  # [N_in, C_in]
    in_coords: jnp.ndarray,  # [N_in, 3]
    in_lookup: CoordLookup,
    in_mask: jnp.ndarray,
    out_coords: jnp.ndarray,  # [N_out, 3]
    out_mask: jnp.ndarray,
    weights: jnp.ndarray,  # [K, C_in, C_out]
    offsets: jnp.ndarray,  # [K, 3]
) -> jnp.ndarray:
    """out[y] = sum_k feats[x = y + o_k] @ W_k (zeros for absent x)."""
    n_out = out_coords.shape[0]
    c_out = weights.shape[-1]

    def step(acc, wo):
        W, off = wo
        nbr = out_coords + off[None, :]
        row, found = lookup_rows(in_lookup, nbr, out_mask)
        f = jnp.where((found & in_mask[row])[:, None], in_feats[row], 0.0)
        return acc + jnp.dot(f, W, preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((n_out, c_out), dtype=jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (weights, offsets))
    return jnp.where(out_mask[:, None], acc, 0.0)


def downsample_coords(
    coords: jnp.ndarray, mask: jnp.ndarray, stride_units: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unique coords floored to multiples of 2*stride (ME stride-2 conv output).

    Fixed shape: returns [N, 3] with survivors compacted to the front + mask.
    """
    new_stride = 2 * stride_units
    floored = (coords // new_stride) * new_stride
    # Lexicographic sort on the COORDINATES (invalid rows last): exact unique
    # extraction with no dependence on the 32-bit hash — two distinct coords
    # colliding on the hash would otherwise merge (dropped site) or, when
    # interleaved inside a hash run, duplicate.
    order = jnp.lexsort(
        (floored[:, 2], floored[:, 1], floored[:, 0], ~mask)
    )
    c_s = floored[order]
    m_s = mask[order]
    boundary = jnp.any(c_s[1:] != c_s[:-1], axis=-1) | (m_s[1:] != m_s[:-1])
    is_first = jnp.concatenate([jnp.ones((1,), bool), boundary]) & m_s
    comp = jnp.argsort(~is_first, stable=True)
    return c_s[comp], is_first[comp]
