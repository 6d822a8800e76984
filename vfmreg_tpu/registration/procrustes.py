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


# --------------------------------------------------------------------------
# TPU-fast rotation solve: Horn's quaternion method with an unrolled cyclic
# Jacobi eigensolver. XLA lowers jnp.linalg.svd to a slow iterative loop on
# TPU (measured: the 3x3 SVDs dominated the driver's 50k-hypothesis RANSAC at
# ~1.4 s/scene); the optimal rotation is equally the leading eigenvector of
# Horn's 4x4 symmetric quaternion matrix (Horn 1987), which a fixed 6-sweep
# branch-free Jacobi diagonalization recovers to f32 machine precision with
# nothing but batched 4x4 matmuls. Produces a PROPER rotation by construction
# (the det-sign reflection fix of the SVD route is implicit).
# --------------------------------------------------------------------------

_JACOBI_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _jacobi_eigh4(N: jnp.ndarray, sweeps: int = 6):
    """Cyclic Jacobi on [..., 4, 4] symmetric matrices (unrolled, branch-free).

    Returns (eigenvalues [..., 4] ~ diagonal, eigenvectors [..., 4, 4] columns).
    """
    V = jnp.broadcast_to(jnp.eye(4, dtype=N.dtype), N.shape)
    A = N
    eye = jnp.eye(4, dtype=N.dtype)
    for _ in range(sweeps):
        for p, q in _JACOBI_PAIRS:
            app = A[..., p, p]
            aqq = A[..., q, q]
            apq = A[..., p, q]
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            # G = I with G[p,p]=c, G[q,q]=c, G[p,q]=s, G[q,p]=-s
            G = jnp.broadcast_to(eye, A.shape)
            G = G.at[..., p, p].set(c)
            G = G.at[..., q, q].set(c)
            G = G.at[..., p, q].set(s)
            G = G.at[..., q, p].set(-s)
            A = jnp.swapaxes(G, -1, -2) @ A @ G
            V = V @ G
    return jnp.diagonal(A, axis1=-2, axis2=-1), V


def _quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) -> [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.maximum(w * w + x * x + y * y + z * z, 1e-20)
    w, x, y, z = w / jnp.sqrt(n), x / jnp.sqrt(n), y / jnp.sqrt(n), z / jnp.sqrt(n)
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def rotation_horn(H: jnp.ndarray) -> jnp.ndarray:
    """Optimal proper rotation R maximizing sum_n w_n tgt_n . (R src_n), from the
    cross-covariance H[..., i, j] = sum_n w_n src_i tgt_j (the same H the SVD
    route consumes: R_svd = V diag(1,1,det) U^T)."""
    S = H
    s00, s01, s02 = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    s10, s11, s12 = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    s20, s21, s22 = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([s00 + s11 + s22, s12 - s21, s20 - s02, s01 - s10], -1),
            jnp.stack([s12 - s21, s00 - s11 - s22, s01 + s10, s20 + s02], -1),
            jnp.stack([s20 - s02, s01 + s10, -s00 + s11 - s22, s12 + s21], -1),
            jnp.stack([s01 - s10, s20 + s02, s12 + s21, -s00 - s11 + s22], -1),
        ],
        -2,
    )
    vals, vecs = _jacobi_eigh4(N)
    best = jnp.argmax(vals, axis=-1)
    q = jnp.take_along_axis(vecs, best[..., None, None].repeat(4, axis=-2), axis=-1)[..., 0]
    return _quat_to_matrix(q)


def kabsch_horn(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """`kabsch` with the Horn/Jacobi rotation core (TPU fast path).

    src/tgt: [..., N, 3] -> [..., 4, 4]. Unweighted (the RANSAC minimal-sample
    use); `weighted_kabsch` keeps the SVD route where torch parity is pinned
    (PointDSC)."""
    c_src = jnp.mean(src, axis=-2)
    c_tgt = jnp.mean(tgt, axis=-2)
    src_c = src - c_src[..., None, :]
    tgt_c = tgt - c_tgt[..., None, :]
    H = jnp.einsum("...ni,...nj->...ij", src_c, tgt_c,
                   precision=jax.lax.Precision.HIGHEST)
    R = rotation_horn(H)
    t = c_tgt - jnp.einsum("...ij,...j->...i", R, c_src,
                           precision=jax.lax.Precision.HIGHEST)
    T = jnp.zeros(src.shape[:-2] + (4, 4), dtype=src.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T
