"""VFM-ICP — descriptor-guided ICP with MAD-filtered correspondences.

Behavioral clone of the VectorNd `RegisterFrame` overload
(`core/Registration.cpp:197-382`):

Phase 1 (VFM loop):
  1. heavily voxel-downsample the (guess-transformed) source at 5 m; if fewer than
     100 survivors, keep the full source (`:217-221`);
  2. one-shot cosine 1-NN correspondences vs the map descriptors at
     min_cosine_similarity = 0.8 (`:228-229`, faiss);
  3. iterate: robust GN step on the surviving correspondence set -> transform both
     the full source and the correspondence sources -> recompute distances ->
     narrow the set with |d - median| < 1.5 * MAD (`:316-330`) -> stop when the
     pre-filter mean distance changes by < 0.01 (`:332-335`).
Phase 2: continue with vanilla geometric ICP against the voxel grid, sharing the
  1000-iteration budget (`:347-372`).

TPU design: correspondences are a fixed-shape masked set; "filtering" narrows the
mask monotonically. Phase 1 is a jitted `lax.while_loop`; phase 2 reuses the
candidate-cached `geometric_icp_loop` from `registration.icp`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vfmreg_tpu.geometry.se3 import exp_se3, inverse_se3, transform_points
from vfmreg_tpu.ops.hash_grid import HashGrid
from vfmreg_tpu.utils.precision import full_precision
from vfmreg_tpu.ops.matching import VFMCorrespondences, masked_mad
from vfmreg_tpu.registration.icp import (
    ESTIMATION_THRESHOLD,
    MAX_NUM_ITERATIONS,
    _conjugate_translation,
    build_linear_system,
    geometric_icp_loop,
    gn_step,
)

EUCL_DIST_THRESHOLD = 0.01  # Registration.cpp:94
MAD_MULTIPLIER = 1.5  # Registration.cpp:320


class _VFMState(NamedTuple):
    T_icp: jnp.ndarray
    source: jnp.ndarray  # full source cloud (world frame)
    src_c: jnp.ndarray  # correspondence sources (transformed along)
    corr_mask: jnp.ndarray
    prev_mean: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray




@partial(jax.jit, static_argnames=("max_iterations", "merge_cache"))
@full_precision
def register_frame_vfm(
    grid: HashGrid,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    corr: VFMCorrespondences,
    initial_guess: jnp.ndarray,
    max_correspondence_distance,
    kernel,
    max_iterations: int = MAX_NUM_ITERATIONS,
    merge_cache=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the VFM + geometric ICP loops given precomputed VFM correspondences.

    `corr` must be computed from the guess-transformed source (the caller owns the
    5 m voxelization + cosine matching — see `pipeline.registration` — because the
    correspondence search is a large matmul best staged outside the while loop).

    `merge_cache` (static callable) is the map-sharded champion merge hook of
    `registration.icp.geometric_icp_loop`, forwarded to phase 2 — used when
    `grid` covers one shard of the map rows under `shard_map`
    (`parallel.mesh.map_sharded_vfm_register`). Phase 1 is correspondence-
    driven and needs no map access, so it is unaffected by sharding.

    Returns (pose[4,4], src_corr[N,3], tgt_corr[N,3], corr_mask[N]) where the
    correspondence arrays mirror the `src_` / `tgt_` out-params of the reference.
    """
    points = points.astype(jnp.float32)
    initial_guess = initial_guess.astype(jnp.float32)
    source0 = transform_points(points, initial_guess)
    denom = jnp.maximum(jnp.sum(mask), 1)
    center = jnp.sum(jnp.where(mask[:, None], source0, 0.0), axis=0) / denom

    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    max_dist = jnp.asarray(max_correspondence_distance, dtype=jnp.float32)

    tgt_c = corr.target
    d0 = jnp.linalg.norm(corr.source - tgt_c, axis=-1)
    n0 = jnp.maximum(jnp.sum(corr.mask.astype(jnp.int32)), 1)
    prev_mean = jnp.sum(jnp.where(corr.mask, d0, 0.0)) / n0

    # ---------------- Phase 1: VFM loop (`Registration.cpp:253-336`) ------------
    def vfm_cond(s: _VFMState):
        return (s.it < max_iterations) & ~s.done

    def vfm_body(s: _VFMState) -> _VFMState:
        JTJ, JTr, n_corr = build_linear_system(s.src_c, tgt_c, s.corr_mask, kernel, center)
        dx = gn_step(JTJ, JTr, n_corr)
        est = _conjugate_translation(exp_se3(dx), center)
        source = transform_points(s.source, est)
        src_c = transform_points(s.src_c, est)
        T_icp = est @ s.T_icp

        d = jnp.linalg.norm(src_c - tgt_c, axis=-1)
        n = jnp.maximum(jnp.sum(s.corr_mask.astype(jnp.int32)), 1)
        mean = jnp.sum(jnp.where(s.corr_mask, d, 0.0)) / n
        med, mad = masked_mad(d, s.corr_mask)
        corr_mask = s.corr_mask & (jnp.abs(d - med) < MAD_MULTIPLIER * mad)

        converged = jnp.abs(s.prev_mean - mean) < EUCL_DIST_THRESHOLD
        return _VFMState(
            T_icp=T_icp,
            source=source,
            src_c=src_c,
            corr_mask=corr_mask,
            prev_mean=mean,
            it=s.it + 1,
            done=converged | (n_corr == 0),
        )

    init1 = _VFMState(
        T_icp=jnp.eye(4, dtype=jnp.float32),
        source=source0,
        src_c=corr.source.astype(jnp.float32),
        corr_mask=corr.mask,
        prev_mean=prev_mean,
        it=jnp.int32(0),
        done=corr.count == 0,
    )
    s1 = jax.lax.while_loop(vfm_cond, vfm_body, init1)

    # ------------- Phase 2: geometric ICP (`Registration.cpp:347-372`) ---------
    s2 = geometric_icp_loop(
        grid,
        s1.source,
        mask,
        s1.T_icp,
        center,
        max_dist,
        kernel,
        max_iterations,
        ESTIMATION_THRESHOLD,
        it0=s1.it,
        merge_cache=merge_cache,
    )

    # The reference transforms the returned correspondence sources along with
    # phase 2 (`Registration.cpp:365`); apply the cumulative phase-2 motion.
    T_phase2 = s2.T_icp @ inverse_se3(s1.T_icp)
    src_c_final = transform_points(s1.src_c, T_phase2)

    pose = s2.T_icp @ initial_guess
    return pose, src_c_final, tgt_c, s1.corr_mask
