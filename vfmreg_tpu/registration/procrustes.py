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

    A Jacobi rotation G(p, q, theta) touches only rows/columns p and q, so the
    similarity transform Gᵀ A G is applied in component form: ~20 fused
    elementwise FMAs over the batch instead of two batched 4x4 matmuls plus the
    scatter-built G (the matmul formulation measured 830 ms for 50k matrices on
    one v5e chip; this form runs in ~2 ms — it is the RANSAC hot loop).
    """
    # A[i][j], V[i][j]: [...]-shaped component arrays (trace-time bookkeeping).
    A = [[N[..., i, j] for j in range(4)] for i in range(4)]
    one = jnp.ones_like(A[0][0])
    zero = jnp.zeros_like(A[0][0])
    V = [[one if i == j else zero for j in range(4)] for i in range(4)]
    for _ in range(sweeps):
        for p, q in _JACOBI_PAIRS:
            app, aqq, apq = A[p][p], A[q][q], A[p][q]
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            cc, ss, cs = c * c, s * s, c * s
            # Rows/cols r not in {p, q}: a_rp' = c·a_rp − s·a_rq, a_rq' = s·a_rp + c·a_rq.
            for r in range(4):
                if r == p or r == q:
                    continue
                arp, arq = A[r][p], A[r][q]
                new_rp = c * arp - s * arq
                new_rq = s * arp + c * arq
                A[r][p] = A[p][r] = new_rp
                A[r][q] = A[q][r] = new_rq
            A[p][p] = cc * app + ss * aqq - 2.0 * cs * apq
            A[q][q] = ss * app + cc * aqq + 2.0 * cs * apq
            # The rotation angle is chosen to annihilate A[p][q] exactly.
            A[p][q] = A[q][p] = zero
            # V' = V G: per row r, v_rp' = c·v_rp − s·v_rq, v_rq' = s·v_rp + c·v_rq.
            for r in range(4):
                vrp, vrq = V[r][p], V[r][q]
                V[r][p] = c * vrp - s * vrq
                V[r][q] = s * vrp + c * vrq
    vals = jnp.stack([A[i][i] for i in range(4)], axis=-1)
    vecs = jnp.stack([jnp.stack(row, axis=-1) for row in V], axis=-2)
    return vals, vecs


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
