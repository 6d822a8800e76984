"""RANSAC on correspondences — vmapped Kabsch hypotheses with fused scoring.

Replaces `o3d.pipelines.registration.registration_ransac_based_on_correspondence`
as invoked at `registration_node.py:319-327`: ransac_n=3, max_correspondence_
distance=10000 (i.e. every correspondence counts as an inlier), criteria
(max_iteration=50000, confidence=1 → no early exit). In that all-inlier regime
Open3D's (fitness, rmse) ranking degenerates to picking the 3-sample model with the
minimum RMSE over ALL correspondences — which is exactly what this module computes,
as a batched TPU-friendly reduction:

  * sample [K, 3] correspondence triplets (PRNG, uniform over the valid set);
  * closed-form Kabsch per triplet (vmapped 3x3 SVD);
  * score = masked RMSE of |T s_i - t_i| over the full correspondence set, computed
    as one [K_chunk, N] matmul-shaped pass per chunk;
  * arg-min over K.

Also includes the correspondence "snap" filter (`registration_node.py:295-310`):
correspondences are replaced by their nearest points in the voxelized clouds and
dropped when farther than 1e-3 — behaviorally important for the baseline
descriptors whose extraction clouds differ from the ICP voxelization.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vfmreg_tpu.utils.precision import full_precision

from vfmreg_tpu.registration.procrustes import kabsch_horn as kabsch


class RansacResult(NamedTuple):
    pose: jnp.ndarray  # [4, 4] best model
    rmse: jnp.ndarray  # scalar best score
    n_corr: jnp.ndarray  # number of valid correspondences used


@partial(jax.jit, static_argnames=("num_hypotheses", "chunk", "ransac_n"))
@full_precision
def ransac_registration(
    src: jnp.ndarray,  # [N, 3]
    tgt: jnp.ndarray,  # [N, 3]
    mask: jnp.ndarray,  # [N]
    key: jax.Array,
    num_hypotheses: int = 50000,
    chunk: int = 1024,
    ransac_n: int = 3,
) -> RansacResult:
    n = src.shape[0]
    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)

    # Compact valid correspondence indices to the front for uniform sampling.
    order = jnp.argsort(~mask, stable=True)
    valid_count = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    src_s, tgt_s = src[order], tgt[order]
    mask_s = mask[order]

    # Work in centered coordinates for f32 robustness far from the origin; the
    # final pose is conjugated back (exact for rigid transforms).
    c = jnp.sum(jnp.where(mask_s[:, None], src_s, 0.0), axis=0) / valid_count
    src_c = src_s - c
    tgt_c = tgt_s - c

    picks = jax.random.randint(key, (num_hypotheses, ransac_n), 0, valid_count)
    n_mask_f = mask_s.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(n_mask_f), 1.0)

    # Sufficient statistics for the masked RMSE: for a RIGID model
    # (|R s|^2 = |s|^2) the summed residual expands to
    #   sum_n m_n |R s_n + t - g_n|^2
    #     = S_ss + S_tt + M |t|^2 + 2 t.(R a) - 2 <A, R>_F - 2 t.g
    # with a = sum m s, g = sum m g_n, S_ss = sum m |s|^2, S_tt = sum m |g|^2,
    # A = sum m g_n s_n^T — ONE O(N) pass, then O(1) per hypothesis instead
    # of the [K, N] residual sweep (the former snap_and_ransac hot cost:
    # 50k x corr-width residual evals per scan).
    #
    # PRECISION (x64 stays off for TPU): the expansion subtracts O(|s|^2 * N)
    # terms (~1e6-1e7 at centered |s| ~ 30 m spread, N ~ 2k), so f32 score
    # noise is ~eps * term / M ~ 1e-4 m^2 on the per-point MSE — i.e. winner
    # selection among models whose RMSE agrees to ~2-3 mm becomes
    # noise-ordered, while the old [K, N] sweep's small-residual sums ordered
    # those ties ~1e-3-noisily anyway. Any such winner is an equally valid
    # min-RMSE model: the pose feeds an ICP refinement whose basin dwarfs
    # millimetres, and the quality gates (0.3 m / 0.6 m) sit three orders
    # above the noise floor (recall parity re-pinned in
    # tests/test_recall_parity.py; score-vs-sweep agreement in
    # tests/test_ransac.py::test_ransac_statistic_scores_match_residual_sweep).
    w = n_mask_f[:, None]
    a_vec = jnp.sum(src_c * w, axis=0)  # [3]
    g_vec = jnp.sum(tgt_c * w, axis=0)  # [3]
    s_ss = jnp.sum(jnp.sum(src_c * src_c, axis=-1) * n_mask_f)
    s_tt = jnp.sum(jnp.sum(tgt_c * tgt_c, axis=-1) * n_mask_f)
    A_cov = jnp.einsum("ni,nj->ij", tgt_c * w, src_c)  # [3, 3]

    def score_chunk(carry, pick_block):
        best_rmse, best_T = carry
        tri_src = src_c[pick_block]  # [B, 3, 3]
        tri_tgt = tgt_c[pick_block]
        T = kabsch(tri_src, tri_tgt)  # [B, 4, 4]
        R = T[:, :3, :3]
        t = T[:, :3, 3]
        mse = (
            s_ss + s_tt
            + denom * jnp.sum(t * t, axis=-1)
            + 2.0 * jnp.einsum("bi,bi->b", t, R @ a_vec)
            - 2.0 * jnp.einsum("bij,ij->b", R, A_cov)
            - 2.0 * t @ g_vec
        ) / denom
        mse = jnp.where(
            jnp.all(jnp.isfinite(T.reshape(T.shape[0], -1)), axis=-1), mse, jnp.inf
        )
        # The expansion can go epsilon-negative on near-perfect fits.
        mse = jnp.maximum(mse, 0.0)
        j = jnp.argmin(mse)
        better = mse[j] < best_rmse
        best_rmse = jnp.where(better, mse[j], best_rmse)
        best_T = jnp.where(better, T[j], best_T)
        return (best_rmse, best_T), None

    pad = (-num_hypotheses) % chunk
    picks = jnp.pad(picks, ((0, pad), (0, 0)))
    blocks = picks.reshape(-1, chunk, ransac_n)
    init = (jnp.float32(jnp.inf), jnp.eye(4, dtype=jnp.float32))
    (best_mse, best_T_c), _ = jax.lax.scan(score_chunk, init, blocks)

    # Un-center: T_world = Trans(c) @ T_c @ Trans(-c)
    R = best_T_c[:3, :3]
    t = best_T_c[:3, 3] + c - R @ c
    best_T = best_T_c.at[:3, 3].set(t)
    # Zero valid correspondences must read as FAILURE (rmse=inf, n_corr=0,
    # identity pose), not as a perfect 0-rmse fit of a garbage model (the
    # all-masked mse sum is 0/denom = 0 for every hypothesis).
    true_count = jnp.sum(mask.astype(jnp.int32))
    any_valid = true_count > 0
    best_T = jnp.where(any_valid, best_T, jnp.eye(4, dtype=jnp.float32))
    best_mse = jnp.where(any_valid, best_mse, jnp.inf)
    return RansacResult(pose=best_T, rmse=jnp.sqrt(best_mse), n_corr=true_count)


@partial(jax.jit, static_argnames=("chunk",))
@full_precision
def snap_correspondences(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    mask: jnp.ndarray,
    scan_points: jnp.ndarray,
    scan_mask: jnp.ndarray,
    map_points: jnp.ndarray,
    map_mask: jnp.ndarray,
    tol: float = 1e-3,
    chunk: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Replace correspondences by their NN in the voxelized clouds; drop > tol.

    Mirrors the sklearn-KDTree filter at `registration_node.py:295-310`.
    Returns (snapped_src, snapped_tgt, new_mask).
    """
    from vfmreg_tpu.ops.matching import _chunked_argmin_l2

    # f32 robustness at world-scale coordinates: the argmin's -2ab expansion
    # catastrophically cancels (measured: ~0.1 m error on true-zero distances
    # at |p| ~ 100 m, wrong NN picks beyond ~500 m), so (a) the NN search runs
    # on globally CENTERED clouds — one shared shift preserves all pairwise
    # distances exactly — and (b) the tol gate uses the directly-computed
    # distance to the gathered point, never the expanded d2.
    n_src = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    c = jnp.sum(jnp.where(mask[:, None], src, 0.0), axis=0) / n_src
    src_c = (src - c).astype(jnp.float32)
    _, idx_s = _chunked_argmin_l2(src_c, scan_points - c, scan_mask, chunk)
    _, idx_t = _chunked_argmin_l2((tgt - c).astype(jnp.float32), map_points - c, map_mask, chunk)
    snapped_src = scan_points[idx_s]
    snapped_tgt = map_points[idx_t]
    d_s = jnp.linalg.norm(src - snapped_src, axis=-1)
    d_t = jnp.linalg.norm(tgt - snapped_tgt, axis=-1)
    ok = mask & (d_s < tol) & (d_t < tol)
    return snapped_src, snapped_tgt, ok
