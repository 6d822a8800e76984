"""Descriptor matching — the TPU replacement for faiss / scipy-KDTree search.

Three reference behaviors live here:

* `get_vfm_correspondences`: L2-renormalized 384-d cosine 1-NN from scan points to
  map points with a minimum-similarity gate (`VoxelHashMap::GetVFMCorrespondences`,
  `core/VoxelHashMap.cpp:461-626`, faiss `IndexFlatIP`). On TPU this is a pure
  dense [N, M] x D inner-product problem — ideal MXU shape. The median/MAD
  statistics the reference computes (and leaves disabled as a rejection rule,
  `:571-584`) are returned for telemetry.
* `mutual_nn_correspondences`: bidirectional descriptor-space L2 1-NN with a
  mutuality filter or top-k-by-distance selection (`find_correspondences`,
  `registration_node.py:482-538`, scipy cKDTree).
* `masked_median` / `masked_mad`: the reference's `nth_element`-based median/MAD
  (`Registration.cpp:289-314`) on fixed-shape masked arrays.

All entry points stream over the map dimension in chunks (`lax.scan` with a running
arg-max) so the [N, M] similarity matrix never materializes — M can be 1e6+.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy constant: a module-level jnp scalar would initialize the backend at
# import time (hangs imports when the remote-TPU tunnel is down).
_NEG_INF = np.float32(-np.inf)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """faiss `fvec_renorm_L2` semantics: zero vectors stay zero."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return jnp.where(norm > eps, x / jnp.maximum(norm, 1e-20), jnp.zeros_like(x))


def _chunked_argmax_ip(
    queries: jnp.ndarray,  # [N, D]
    database: jnp.ndarray,  # [M, D]
    db_mask: jnp.ndarray,  # [M]
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """argmax_j <q_i, d_j> streamed over M in chunks. Returns (best_sim[N], best_idx[N])."""
    m = database.shape[0]
    pad = (-m) % chunk
    if pad:
        database = jnp.pad(database, ((0, pad), (0, 0)))
        db_mask = jnp.pad(db_mask, (0, pad))
    num_chunks = database.shape[0] // chunk
    db_blocks = database.reshape(num_chunks, chunk, -1)
    mask_blocks = db_mask.reshape(num_chunks, chunk)

    def step(carry, block):
        best_sim, best_idx, offset = carry
        db, bm = block
        sim = jnp.dot(queries, db.T, preferred_element_type=jnp.float32)
        sim = jnp.where(bm[None, :], sim, _NEG_INF)
        j = jnp.argmax(sim, axis=1)
        s = jnp.take_along_axis(sim, j[:, None], axis=1)[:, 0]
        better = s > best_sim
        best_sim = jnp.where(better, s, best_sim)
        best_idx = jnp.where(better, offset + j, best_idx)
        return (best_sim, best_idx, offset + chunk), None

    n = queries.shape[0]
    init = (
        jnp.full((n,), _NEG_INF, dtype=jnp.float32),
        jnp.zeros((n,), dtype=jnp.int32),
        jnp.int32(0),
    )
    (best_sim, best_idx, _), _ = jax.lax.scan(step, init, (db_blocks, mask_blocks))
    return best_sim, best_idx


def _chunked_argmin_l2(
    queries: jnp.ndarray,
    database: jnp.ndarray,
    db_mask: jnp.ndarray,
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """argmin_j |q_i - d_j|^2 via the -2ab expansion; returns (best_d2[N], best_idx[N])."""
    q2 = jnp.sum(queries * queries, axis=-1)
    # min |q-d|^2 = q^2 + min(d^2 - 2 q.d). Stream the parenthesized term.
    m = database.shape[0]
    pad = (-m) % chunk
    if pad:
        database = jnp.pad(database, ((0, pad), (0, 0)))
        db_mask = jnp.pad(db_mask, (0, pad))
    num_chunks = database.shape[0] // chunk
    db_blocks = database.reshape(num_chunks, chunk, -1)
    mask_blocks = db_mask.reshape(num_chunks, chunk)

    def step(carry, block):
        best_val, best_idx, offset = carry
        db, bm = block
        d2 = jnp.sum(db * db, axis=-1)
        val = d2[None, :] - 2.0 * jnp.dot(queries, db.T, preferred_element_type=jnp.float32)
        val = jnp.where(bm[None, :], val, jnp.inf)
        j = jnp.argmin(val, axis=1)
        v = jnp.take_along_axis(val, j[:, None], axis=1)[:, 0]
        better = v < best_val
        best_val = jnp.where(better, v, best_val)
        best_idx = jnp.where(better, offset + j, best_idx)
        return (best_val, best_idx, offset + chunk), None

    n = queries.shape[0]
    init = (
        jnp.full((n,), jnp.inf, dtype=jnp.float32),
        jnp.zeros((n,), dtype=jnp.int32),
        jnp.int32(0),
    )
    (best_val, best_idx, _), _ = jax.lax.scan(step, init, (db_blocks, mask_blocks))
    return jnp.maximum(best_val + q2, 0.0), best_idx


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over mask==True entries; reference definition (`Registration.cpp:289-300`):
    element at index n//2 of the sorted array, averaged with the lower-half max when
    n is even — i.e. the standard median."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    v = jnp.sort(jnp.where(mask, values, big))
    cnt = jnp.sum(mask.astype(jnp.int32))
    hi = jnp.clip(cnt // 2, 0, values.shape[0] - 1)
    lo = jnp.clip((cnt - 1) // 2, 0, values.shape[0] - 1)
    med = 0.5 * (v[hi] + v[lo])
    return jnp.where(cnt > 0, med, jnp.float32(0.0))


def masked_mad(values: jnp.ndarray, mask: jnp.ndarray, scale: float = 1.4826):
    """(median, MAD * scale) — `Registration.cpp:302-313`."""
    med = masked_median(values, mask)
    mad = masked_median(jnp.abs(values - med), mask)
    return med, mad * scale


class VFMCorrespondences(NamedTuple):
    source: jnp.ndarray  # [N, 3] scan points (query side)
    target: jnp.ndarray  # [N, 3] matched map points
    mask: jnp.ndarray  # [N] accepted (cosine >= threshold)
    similarity: jnp.ndarray  # [N] best cosine similarity
    mean_similarity: jnp.ndarray  # scalar, over all query points (`:598-602`)
    median_distance: jnp.ndarray  # scalar (telemetry; rejection disabled in ref)
    mad_distance: jnp.ndarray  # scalar

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))


@partial(jax.jit, static_argnames=("chunk", "use_pallas"))
def get_vfm_correspondences(
    map_points: jnp.ndarray,
    map_feats: jnp.ndarray,
    map_mask: jnp.ndarray,
    scan_points: jnp.ndarray,
    scan_feats: jnp.ndarray,
    scan_mask: jnp.ndarray,
    min_cosine_similarity=0.8,
    chunk: int = 4096,
    use_pallas: Optional[bool] = None,
) -> VFMCorrespondences:
    """Cosine 1-NN in descriptor space, scan -> map (`VoxelHashMap.cpp:461-626`).

    On TPU the arg-max runs through the fused Pallas kernel
    (`ops/cosine_kernel.py`); elsewhere the `lax.scan` streaming path.
    """
    best_sim, best_idx = _best_match(scan_feats, map_feats, map_mask, chunk, use_pallas)
    target = map_points[best_idx]
    return _assemble_correspondences(
        scan_points, scan_mask, best_sim, target, min_cosine_similarity
    )


def _best_match(scan_feats, map_feats, map_mask, chunk, use_pallas):
    """L2-normalize both sides and run the cosine arg-max — the fused Pallas
    kernel on TPU, the `lax.scan` streaming path elsewhere. Shared preamble of
    the single-device / map-sharded / batched searches (their parity contracts
    assume ONE implementation)."""
    qn = l2_normalize(scan_feats.astype(jnp.float32))
    dbn = l2_normalize(map_feats.astype(jnp.float32))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from vfmreg_tpu.ops.cosine_kernel import cosine_argmax

        return cosine_argmax(qn, dbn, map_mask)
    return _chunked_argmax_ip(qn, dbn, map_mask, chunk)


def _assemble_correspondences(
    scan_points, scan_mask, best_sim, target, min_cosine_similarity
) -> VFMCorrespondences:
    """Acceptance gate + telemetry tail shared by the single-device and
    map-sharded correspondence searches."""
    accept = scan_mask & (best_sim >= jnp.asarray(min_cosine_similarity, jnp.float32))
    dist = jnp.linalg.norm(scan_points - target, axis=-1)
    med, mad = masked_mad(dist, accept)
    n_q = jnp.maximum(jnp.sum(scan_mask.astype(jnp.int32)), 1)
    mean_sim = jnp.sum(jnp.where(scan_mask, best_sim, 0.0)) / n_q
    return VFMCorrespondences(
        source=scan_points,
        target=target,
        mask=accept,
        similarity=best_sim,
        mean_similarity=mean_sim,
        median_distance=med,
        mad_distance=mad,
    )


def get_vfm_correspondences_map_sharded(
    map_points: jnp.ndarray,  # [M/n_dev, 3]   (this device's shard)
    map_feats: jnp.ndarray,  # [M/n_dev, D]
    map_mask: jnp.ndarray,  # [M/n_dev]
    scan_points: jnp.ndarray,  # [N, 3]        (replicated)
    scan_feats: jnp.ndarray,  # [N, D]
    scan_mask: jnp.ndarray,  # [N]
    axis: str,
    min_cosine_similarity=0.8,
    chunk: int = 4096,
    use_pallas: Optional[bool] = None,
) -> VFMCorrespondences:
    """`get_vfm_correspondences` with the MAP sharded over mesh `axis` — call
    INSIDE `shard_map` (see `parallel.mesh.map_sharded_vfm_register`).

    Each device runs the cosine arg-max over its row shard; the global winner
    is the max over devices (one all_gather of per-shard [N] sims + [N, 3]
    matched points, ~0.5 MB at N=8192 over ICI). Tie-breaks match the
    single-device search exactly: shard_map blocks are CONTIGUOUS row ranges
    and both the within-shard and the across-device arg-max pick the first
    (lowest-index) maximum, so the winner is the lowest global row index.
    """
    best_sim, best_idx = _best_match(scan_feats, map_feats, map_mask, chunk, use_pallas)
    target_s = map_points[best_idx]  # [N, 3] this shard's champion

    sims = jax.lax.all_gather(best_sim, axis)  # [n_dev, N]
    tgts = jax.lax.all_gather(target_s, axis)  # [n_dev, N, 3]
    dev = jnp.argmax(sims, axis=0)  # first max -> lowest device
    best_sim = jnp.max(sims, axis=0)
    target = jnp.take_along_axis(tgts, dev[None, :, None], axis=0)[0]
    return _assemble_correspondences(
        scan_points, scan_mask, best_sim, target, min_cosine_similarity
    )


@partial(jax.jit, static_argnames=("chunk", "use_pallas"))
def get_vfm_correspondences_batched(
    map_points: jnp.ndarray,
    map_feats: jnp.ndarray,
    map_mask: jnp.ndarray,
    scan_points: jnp.ndarray,  # [B, N, 3]
    scan_feats: jnp.ndarray,  # [B, N, D]
    scan_mask: jnp.ndarray,  # [B, N]
    min_cosine_similarity=0.8,
    chunk: int = 4096,
    use_pallas: Optional[bool] = None,
) -> VFMCorrespondences:
    """`get_vfm_correspondences` over B scans sharing ONE map, flattening the
    batch into the query dimension so the database streams from HBM once.

    Results are identical to the vmapped per-scan calls (the cosine arg-max is
    per-query-row; only the grid layout changes), but the map side — the
    dominant HBM traffic at production scale (524k x 384 f32 = 805 MB) — is
    read once instead of B times. Measured at B=8 x 512 queries vs 524k: the
    vmapped path re-streams 6.4 GB; this path streams 0.8 GB.
    Returns the stacked VFMCorrespondences with [B, ...] fields.
    """
    b, n, d = scan_feats.shape
    best_sim, best_idx = _best_match(
        scan_feats.reshape(b * n, d), map_feats, map_mask, chunk, use_pallas
    )
    best_sim = best_sim.reshape(b, n)
    best_idx = best_idx.reshape(b, n)

    accept = scan_mask & (best_sim >= jnp.asarray(min_cosine_similarity, jnp.float32))
    target = map_points[best_idx]
    dist = jnp.linalg.norm(scan_points - target, axis=-1)
    med, mad = jax.vmap(masked_mad)(dist, accept)
    n_q = jnp.maximum(jnp.sum(scan_mask.astype(jnp.int32), axis=1), 1)
    mean_sim = jnp.sum(jnp.where(scan_mask, best_sim, 0.0), axis=1) / n_q
    return VFMCorrespondences(
        source=scan_points,
        target=target,
        mask=accept,
        similarity=best_sim,
        mean_similarity=mean_sim,
        median_distance=med,
        mad_distance=mad,
    )


class MutualNN(NamedTuple):
    idx0: jnp.ndarray  # [N0] index into cloud 0 (identity order)
    idx1: jnp.ndarray  # [N0] matched index into cloud 1
    mask: jnp.ndarray  # [N0] surviving correspondences
    dist: jnp.ndarray  # [N0] descriptor-space L2 distance


@partial(jax.jit, static_argnames=("mutual_filter", "n_points", "chunk"))
def mutual_nn_correspondences(
    feats0: jnp.ndarray,
    mask0: jnp.ndarray,
    feats1: jnp.ndarray,
    mask1: jnp.ndarray,
    mutual_filter: bool = True,
    n_points: int = 5000,
    chunk: int = 4096,
) -> MutualNN:
    """`find_correspondences` (`registration_node.py:482-538`).

    mutual_filter=True: keep i where NN_1->0(NN_0->1(i)) == i.
    mutual_filter=False: keep the n_points smallest-distance 0->1 matches.
    """
    f0 = feats0.astype(jnp.float32)
    f1 = feats1.astype(jnp.float32)
    d2_01, nn01 = _chunked_argmin_l2(f0, f1, mask1, chunk)
    n0 = f0.shape[0]
    idx0 = jnp.arange(n0, dtype=jnp.int32)
    dist = jnp.sqrt(jnp.maximum(d2_01, 0.0))

    if mutual_filter:
        _, nn10 = _chunked_argmin_l2(f1, f0, mask0, chunk)
        keep = mask0 & (nn10[nn01] == idx0)
    else:
        # Top n_points by distance among valid rows — the reference uses
        # argpartition(n)[:n] with n = min(n_points, len-1) (`:511-516`).
        big = jnp.float32(jnp.finfo(jnp.float32).max)
        d_for_rank = jnp.where(mask0, dist, big)
        order = jnp.argsort(d_for_rank)
        rank = jnp.zeros((n0,), dtype=jnp.int32).at[order].set(idx0)
        n_valid = jnp.sum(mask0.astype(jnp.int32))
        n_keep = jnp.minimum(jnp.int32(n_points), jnp.maximum(n_valid - 1, 0))
        keep = mask0 & (rank < n_keep)
    return MutualNN(idx0=idx0, idx1=nn01, mask=keep, dist=dist)
