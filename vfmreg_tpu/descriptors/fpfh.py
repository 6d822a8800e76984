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
the neighbor budget); histograms are one-hot matmuls; queries are processed in
fixed-size chunks so arbitrarily large clouds fit the [chunk, k] intermediates.
Neighborhood candidates are capped at 27*cap grid entries — a documented
approximation vs the exact KD-tree for ultra-dense clouds.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmreg_tpu.ops.hash_grid import build_hash_grid
from vfmreg_tpu.ops.knn import radius_knn
from vfmreg_tpu.ops.voxel import INVALID_HASH, bucket_size, voxel_coords, voxel_down_sample_masked, voxel_hash

N_BINS = 11
QUERY_CHUNK = 32768


def _grid_input_order(points, mask, voxel_size):
    """Input row held by each grid row (the grid's stable hash sort)."""
    h = voxel_hash(voxel_coords(points, voxel_size))
    h = jnp.where(mask, h, INVALID_HASH)
    return jnp.argsort(h, stable=True)


@partial(jax.jit, static_argnames=("max_nn",))
def _normals_chunk(grid, q_pts, q_mask, radius, max_nn: int):
    knn = radius_knn(grid, q_pts, q_mask, k=max_nn, radius=radius)
    nbr = grid.points[knn.idx]
    w = knn.mask.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(nbr * w[..., None], axis=1) / cnt
    diff = (nbr - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", diff, diff) / cnt[..., None]
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[:, :, 0]
    sign = jnp.where(
        normal[:, 2] != 0,
        jnp.sign(normal[:, 2]),
        jnp.where(normal[:, 1] != 0, jnp.sign(normal[:, 1]), jnp.sign(normal[:, 0] + 1e-30)),
    )
    return normal * sign[:, None]


def estimate_normals(
    points: jnp.ndarray, mask: jnp.ndarray, radius, max_nn: int = 30, chunk: int = QUERY_CHUNK
) -> jnp.ndarray:
    """PCA normals (smallest covariance eigenvector), +z-hemisphere sign
    (Open3D KDTreeSearchParamHybrid(radius, 30) equivalent, unoriented)."""
    grid = build_hash_grid(points, radius, mask=mask, max_points_per_voxel=max_nn + 8)
    n = points.shape[0]
    outs = []
    for b in range(0, n, chunk):
        outs.append(
            np.asarray(_normals_chunk(grid, points[b : b + chunk], mask[b : b + chunk], radius, max_nn))
        )
    return jnp.asarray(np.concatenate(outs))


def _pair_features(p, n_p, q, n_q, valid):
    """(f1, f2, f3) Darboux angles with PCL source/target ordering."""
    d = q - p
    dist = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(dist[..., None], 1e-12)
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

    f1 = jnp.sum(v * tgt_n, axis=-1)
    f2 = jnp.sum(u * d_st, axis=-1)
    f3 = jnp.arctan2(jnp.sum(w * tgt_n, axis=-1), jnp.sum(u * tgt_n, axis=-1))
    degenerate = (dist < 1e-12) | (v_norm[..., 0] < 1e-12)
    return f1, f2, f3, valid & ~degenerate


def _histogram(f, lo, hi, weights):
    bins = jnp.clip(((f - lo) / (hi - lo) * N_BINS).astype(jnp.int32), 0, N_BINS - 1)
    onehot = jax.nn.one_hot(bins, N_BINS, dtype=jnp.float32)
    return jnp.einsum("nkb,nk->nb", onehot, weights)


@partial(jax.jit, static_argnames=("max_nn",))
def _spfh_chunk(grid, order, points, normals, q_pts, q_normals, q_mask, radius, max_nn: int):
    knn = radius_knn(grid, q_pts, q_mask, k=max_nn, radius=radius, exclude_self=True)
    nbr_input_idx = order[knn.idx]
    q = points[nbr_input_idx]
    n_q = normals[nbr_input_idx]
    f1, f2, f3, valid = _pair_features(q_pts[:, None, :], q_normals[:, None, :], q, n_q, knn.mask)
    k_count = jnp.maximum(jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True), 1.0)
    incr = jnp.where(valid, 100.0 / k_count, 0.0)
    spfh = jnp.concatenate(
        [
            _histogram(f1, -1.0, 1.0, incr),
            _histogram(f2, -1.0, 1.0, incr),
            _histogram(f3, -jnp.pi, jnp.pi, incr),
        ],
        axis=1,
    )
    return spfh, knn.idx, knn.dist, valid


@jax.jit
def _fpfh_chunk(spfh_all, order, own_spfh, nbr_idx, nbr_dist, valid):
    """Distance-weighted neighbor SPFH sum, per-block renormalized to 100, +own."""
    nbr_input_idx = order[nbr_idx]
    inv_d = jnp.where(valid, 1.0 / jnp.maximum(nbr_dist, 1e-12), 0.0)
    nbr_spfh = spfh_all[nbr_input_idx]
    acc = jnp.einsum("nkf,nk->nf", nbr_spfh, inv_d)
    block_sums = acc.reshape(-1, 3, N_BINS).sum(axis=2, keepdims=True)
    acc = (acc.reshape(-1, 3, N_BINS) / jnp.maximum(block_sums, 1e-12) * 100.0).reshape(-1, 33)
    has_nbr = jnp.sum(valid, axis=1) > 0
    return jnp.where(has_nbr[:, None], acc + own_spfh, own_spfh)


def _fpfh_on_cloud(points, normals, mask, radius, max_nn: int = 100, chunk: int = QUERY_CHUNK):
    grid = build_hash_grid(points, radius, mask=mask, max_points_per_voxel=48)
    order = _grid_input_order(points, mask, grid.voxel_size)
    n = points.shape[0]

    spfh_parts, idx_parts, dist_parts, valid_parts = [], [], [], []
    for b in range(0, n, chunk):
        s, i, d, v = _spfh_chunk(
            grid, order, points, normals,
            points[b : b + chunk], normals[b : b + chunk], mask[b : b + chunk],
            radius, max_nn,
        )
        spfh_parts.append(s)
        idx_parts.append(i)
        dist_parts.append(d)
        valid_parts.append(v)
    spfh_all = jnp.concatenate(spfh_parts)

    outs = []
    for s, i, d, v in zip(spfh_parts, idx_parts, dist_parts, valid_parts):
        outs.append(np.asarray(_fpfh_chunk(spfh_all, order, s, i, d, v)))
    return np.concatenate(outs)


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
    out_feats = feats[m].astype(np.float64)
    if normalize:
        out_feats = out_feats / (np.linalg.norm(out_feats, axis=1, keepdims=True) + 1e-6)
    return out_pts, out_feats
