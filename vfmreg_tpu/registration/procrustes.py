"""Rigid Procrustes (Kabsch) solvers — the SVD core under RANSAC and PointDSC.

Replaces Open3D's `TransformationEstimationPointToPoint`
(`registration_node.py:324`) and PointDSC's `rigid_transform_3d`
(`pointdsc/common.py:7-49`) with vmap-friendly JAX. The weighted variant is the
weighted Procrustes used by PointDSC's hypothesis generation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kabsch(src: jnp.ndarray, tgt: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Least-squares rigid transform T with T @ src ~= tgt. src/tgt: [..., N, 3]."""
    if mask is None:
        mask = jnp.ones(src.shape[:-1], dtype=src.dtype)
    return weighted_kabsch(src, tgt, mask)


def weighted_kabsch(src: jnp.ndarray, tgt: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted Procrustes. w: [..., N] nonnegative. Returns [..., 4, 4].

    Reflection is corrected via the det-sign trick (same as PointDSC
    `common.py:30-41`).
    """
    w = w.astype(src.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    wn = w / wsum
    c_src = jnp.sum(wn[..., None] * src, axis=-2)
    c_tgt = jnp.sum(wn[..., None] * tgt, axis=-2)
    src_c = src - c_src[..., None, :]
    tgt_c = tgt - c_tgt[..., None, :]
    H = jnp.einsum("...ni,...n,...nj->...ij", src_c, wn, tgt_c,
                   precision=jax.lax.Precision.HIGHEST)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = jnp.einsum("...ji,...j,...kj->...ik", Vt, D, U,
                   precision=jax.lax.Precision.HIGHEST)  # V diag(1,1,det) U^T
    t = c_tgt - jnp.einsum("...ij,...j->...i", R, c_src,
                           precision=jax.lax.Precision.HIGHEST)
    T = jnp.zeros(src.shape[:-2] + (4, 4), dtype=src.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T
