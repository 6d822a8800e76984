"""FPFH (Fast Point Feature Histograms) in JAX.

Replaces Open3D's `estimate_normals` + `compute_fpfh_feature` as used by
`extract_fpfh_features` (`vfm_reg/descriptors.py:19-42`): normals from 30-NN PCA
within radius 2*voxel, voxel downsample, 33-bin FPFH with radius 5*voxel /
max 100 neighbors, optional L2 normalization.

Algorithm (PCL/Open3D): per point pair (p, q) with normals (n_p, n_q), order the
pair so the source's normal has the larger angle to the connecting line, build
the Darboux frame (u=n_s, v=d x u, w=u x v) and bin
  f1 = v . n_t            in [-1, 1]
  f2 = |d|-normalized u.d  -> phi in [-1, 1]
  f3 = atan2(w . n_t, u . n_t) in [-pi, pi]
into 3 x 11 bins (SPFH, each pair contributing 100/k). FPFH(p) = SPFH(p) +
(1/k) sum_q SPFH(q) / |p-q| with each neighbor-sum sub-histogram renormalized to
100 (Open3D Feature.cpp semantics).

TPU notes: neighborhoods come from the 27-voxel hash grid (build cap sized to
the neighbor budget); histograms are one-hot matmuls (MXU-shaped [N*k, 11]);
everything is fixed-shape and masked. Neighborhood candidates are capped at
27*cap grid entries — a documented approximation vs the exact KD-tree for
ultra-dense clouds.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmreg_tpu.ops.hash_grid import build_hash_grid
from vfmreg_tpu.ops.knn import radius_knn
from vfmreg_tpu.ops.voxel import bucket_size, voxel_down_sample_masked

N_BINS = 11


@partial(jax.jit, static_argnames=("max_nn",))
def estimate_normals(
    points: jnp.ndarray, mask: jnp.ndarray, radius, max_nn: int = 30
) -> jnp.ndarray:
    """PCA normals (smallest covariance eigenvector), canonical-hemisphere sign.

    Open3D's KDTreeSearchParamHybrid(radius, max_nn=30) equivalent; orientation
    is the +z hemisphere (Open3D leaves eigen-solver sign — unoriented either way).
    """
    grid = build_hash_grid(points, radius, mask=mask, max_points_per_voxel=max_nn + 8)
    knn = radius_knn(grid, points, mask, k=max_nn, radius=radius)
    nbr = grid.points[knn.idx]  # [N, k, 3]
    w = knn.mask.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(nbr * w[..., None], axis=1) / cnt
    diff = (nbr - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", diff, diff) / cnt[..., None]
    # Smallest eigenvector of the symmetric 3x3.
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[:, :, 0]
    sign = jnp.where(
        normal[:, 2] != 0,
        jnp.sign(normal[:, 2]),
        jnp.where(normal[:, 1] != 0, jnp.sign(normal[:, 1]), jnp.sign(normal[:, 0] + 1e-30)),
    )
    return normal * sign[:, None]


def _pair_features(p, n_p, q, n_q, valid):
    """(f1, f2, f3) Darboux angles with PCL source/target ordering."""
    d = q - p
    dist = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(dist[..., None], 1e-12)
    # Source = endpoint whose normal is better aligned with d (PCL: compare
    # |n1.d| vs |n2.d|, swap so angle1 <= angle2 — i.e. source has larger |dot|).
    dot1 = jnp.sum(n_p * dn, axis=-1)
    dot2 = jnp.sum(n_q * (-dn), axis=-1)
    swap = jnp.abs(dot1) < jnp.abs(dot2)
    src_n = jnp.where(swap[..., None], n_q, n_p)
    tgt_n = jnp.where(swap[..., None], n_p, n_q)
    d_st = jnp.where(swap[..., None], -dn, dn)

    u = src_n
    v = jnp.cross(d_st, u)
    v_norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(v_norm, 1e-12)
    w = jnp.cross(u, v)

    f1 = jnp.sum(v * tgt_n, axis=-1)  # alpha in [-1, 1]
    f2 = jnp.sum(u * d_st, axis=-1)  # phi in [-1, 1]
    f3 = jnp.arctan2(jnp.sum(w * tgt_n, axis=-1), jnp.sum(u * tgt_n, axis=-1))
    degenerate = (dist < 1e-12) | (v_norm[..., 0] < 1e-12)
    return f1, f2, f3, valid & ~degenerate


def _histogram(f, lo, hi, weights):
    """[N, k] values -> [N, 11] soft histogram via one-hot matmul."""
    bins = jnp.clip(((f - lo) / (hi - lo) * N_BINS).astype(jnp.int32), 0, N_BINS - 1)
    onehot = jax.nn.one_hot(bins, N_BINS, dtype=jnp.float32)
    return jnp.einsum("nkb,nk->nb", onehot, weights)


@partial(jax.jit, static_argnames=("max_nn",))
def _fpfh_on_cloud(points, normals, mask, radius, max_nn: int = 100):
    grid = build_hash_grid(points, radius, mask=mask, max_points_per_voxel=48)
    knn = radius_knn(grid, points, mask, k=max_nn, radius=radius, exclude_self=True)
    # Map grid (sorted) indices back to input order to fetch normals: build the
    # permutation grid row -> original row by matching through the stable sort.
    # build_hash_grid sorts by hash; recompute the order here the same way.
    from vfmreg_tpu.ops.voxel import INVALID_HASH, voxel_coords, voxel_hash

    h = voxel_hash(voxel_coords(points, grid.voxel_size))
    h = jnp.where(mask, h, INVALID_HASH)
    order = jnp.argsort(h, stable=True)  # grid row g holds input row order[g]
    nbr_input_idx = order[knn.idx]  # [N, k] -> original rows

    n_p = normals  # [N, 3]
    q = points[nbr_input_idx]
    n_q = normals[nbr_input_idx]
    valid = knn.mask

    f1, f2, f3, valid = _pair_features(
        points[:, None, :], n_p[:, None, :], q, n_q, valid
    )
    k_count = jnp.maximum(jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True), 1.0)
    incr = jnp.where(valid, 100.0 / k_count, 0.0)
    spfh = jnp.concatenate(
        [
            _histogram(f1, -1.0, 1.0, incr),
            _histogram(f2, -1.0, 1.0, incr),
            _histogram(f3, -jnp.pi, jnp.pi, incr),
        ],
        axis=1,
    )  # [N, 33]

    # FPFH: distance-weighted neighbor SPFH sum, each 11-bin block renormalized
    # to 100, plus own SPFH (Open3D Feature.cpp ComputeFPFHFeature).
    inv_d = jnp.where(valid, 1.0 / jnp.maximum(knn.dist, 1e-12), 0.0)
    nbr_spfh = spfh[nbr_input_idx]  # [N, k, 33]
    acc = jnp.einsum("nkf,nk->nf", nbr_spfh, inv_d)
    block_sums = acc.reshape(-1, 3, N_BINS).sum(axis=2, keepdims=True)
    acc = (acc.reshape(-1, 3, N_BINS) / jnp.maximum(block_sums, 1e-12) * 100.0).reshape(-1, 33)
    has_nbr = jnp.sum(valid, axis=1) > 0
    fpfh = jnp.where(has_nbr[:, None], acc + spfh, spfh)
    return fpfh


def extract_fpfh_features(
    pcl: np.ndarray, voxel_size: float, normalize: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-facing API matching `descriptors.py:19-42`. Returns (points, feats[33])."""
    pcl = np.ascontiguousarray(np.asarray(pcl)[:, :3], dtype=np.float32)
    n = bucket_size(max(pcl.shape[0], 1))
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[: pcl.shape[0]] = pcl
    mask = np.zeros((n,), dtype=bool)
    mask[: pcl.shape[0]] = True
    jpts, jmask = jnp.asarray(pts), jnp.asarray(mask)

    normals = estimate_normals(jpts, jmask, radius=2.0 * voxel_size, max_nn=30)

    # Voxelize, keeping the (full-cloud) normals of the surviving points.
    down_pts, down_normals, down_mask = voxel_down_sample_masked(
        jpts, voxel_size, mask=jmask, feats=normals
    )
    feats = _fpfh_on_cloud(down_pts, down_normals, down_mask, radius=5.0 * voxel_size, max_nn=100)

    m = np.asarray(down_mask)
    out_pts = np.asarray(down_pts)[m].astype(np.float64)
    out_feats = np.asarray(feats)[m].astype(np.float64)
    if normalize:
        out_feats = out_feats / (np.linalg.norm(out_feats, axis=1, keepdims=True) + 1e-6)
    return out_pts, out_feats
