"""Point-to-point Gauss-Newton ICP as a jitted `lax.while_loop`.

Behavioral clone of the reference's 3D `RegisterFrame`
(`core/Registration.cpp:145-195`) and its robust linear system
(`BuildLinearSystem`, `:96-140`):

* residual r_i = source_i - target_i, Jacobian J_i = [I | -hat(source_i)];
* Geman-McClure-style weight  w = k^2 / (k + |r|^2)^2  (`:124-126`);
* dx = (J^T W J)^-1 (-J^T W r), pose update T <- exp(dx) T;
* stop when |dx| < 1e-4 or after 1000 iterations (`:92-94,183`).

TPU-first differences from the reference:

* The TBB `parallel_reduce` over ragged correspondence vectors becomes a masked
  einsum over the fixed-shape point array — rejected correspondences get weight 0
  instead of being dropped (identical normal equations).
* The 6-dof solve runs in float32 but **centered at the source centroid**: the GN
  step is parameterized about c = mean(source) (J uses source - c) and the
  resulting motion is conjugated back, exp_world = T(c) exp(dx) T(-c). This removes
  the |p| ~ 100 m lever arm from J^T J and keeps f32 conditioning comparable to the
  reference's float64 Eigen solve (see SURVEY.md §7 "exact ICP/GT parity").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vfmreg_tpu.geometry.se3 import exp_se3, hat_so3, transform_points
from vfmreg_tpu.utils.precision import full_precision
from vfmreg_tpu.ops.hash_grid import (
    HashGrid,
    NNCache,
    build_nn_cache,
    build_weighted_nn_cache,
    candidate_weights,
    gather_candidate_slabs,
    nn_from_cache,
    nn_from_weighted_cache,
)

MAX_NUM_ITERATIONS = 1000  # Registration.cpp:92
ESTIMATION_THRESHOLD = 1e-4  # Registration.cpp:93
# Phase-1 GN-iteration budget of the drivers' two-phase far-field (vanilla
# ICP) rows: lanes that have not fresh-confirmed by then resume in a second,
# lane-compacted dispatch with the remaining MAX_NUM_ITERATIONS - PHASE1
# budget, so a vmapped batch stops paying the while_loop's max-lane iteration
# count for every lane. The value sits at the measured knee of the harness
# workload's far-field lane spread (VFMREG_PROFILE_ICP_ITERS=1 on one v5e
# chip, B=16 lanes: [20,44,62,139,167,190,206,210,245,263,278,349,365,402,
# 552,603] GN iterations): at 256, 10/16 lanes settle in phase 1 and the
# compacted resume runs the straggler tail at half the lane width; the total
# per-lane budget is unchanged. The serial driver replays the identical
# per-lane phase split (`kiss.registration.register_frame(two_phase=True)`),
# which keeps the serial-vs-batched parity pin (tests/test_harness.py) intact.
FAR_FIELD_PHASE1_ITERATIONS = 256
# Champion-cache rebuild cadence: per-voxel champions are recomputed from the
# epoch's gathered slab set every REFRESH_INTERVAL GN iterations (and the slab
# set itself re-gathers whenever accumulated motion exceeds the half-voxel
# slack). Typical inter-rebuild motion is far below the ~voxel-sized slack of
# the 27-neighborhood, so the accepted correspondences match per-iteration-
# exact search in practice; refresh_interval=1 makes every iteration exact
# WITHIN the epoch's slab set (identical to a fresh gather for every point
# that stayed in its gather-time voxel — the same slack class the motion
# bound enforces). Recall neutrality vs =1 is asserted in
# tests/test_harness.py; recall parity vs an exact-KD-tree oracle in
# tests/test_recall_parity.py.
REFRESH_INTERVAL = 16


class _ICPState(NamedTuple):
    source: jnp.ndarray  # [N, 3] current world-frame source points
    T_icp: jnp.ndarray  # [4, 4] accumulated correction
    dx_norm: jnp.ndarray  # scalar
    it: jnp.ndarray  # scalar int32
    done: jnp.ndarray  # scalar bool (no-correspondence early exit)
    confirmed: jnp.ndarray  # scalar bool (convergence validated on a FRESH cache)


def build_linear_system(
    source: jnp.ndarray,
    target: jnp.ndarray,
    weight_mask: jnp.ndarray,
    kernel,
    center: jnp.ndarray,
):
    """Masked robust normal equations (reference `BuildLinearSystem`,
    `Registration.cpp:96-140`), centered at `center`.

    Returns (JTJ[6,6], JTr[6], n_corr).
    """
    s_c = source - center
    residual = source - target  # == s_c - (target - center)
    r2 = jnp.sum(residual * residual, axis=-1)
    w = (kernel * kernel) / jnp.square(kernel + r2)
    w = jnp.where(weight_mask, w, 0.0)

    n = source.shape[0]
    J = jnp.zeros((n, 3, 6), dtype=source.dtype)
    J = J.at[:, :, :3].set(jnp.broadcast_to(jnp.eye(3, dtype=source.dtype), (n, 3, 3)))
    J = J.at[:, :, 3:].set(-hat_so3(s_c))

    JTJ = jnp.einsum("nij,n,nik->jk", J, w, J)
    JTr = jnp.einsum("nij,n,ni->j", J, w, residual)
    return JTJ, JTr, jnp.sum(weight_mask.astype(jnp.int32))


def _cholesky_solve6(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled 6x6 SPD Cholesky solve (A x = b).

    `jnp.linalg.solve` lowers to a general LU kernel that costs ~0.3 ms per
    dispatch on TPU — ~20% of a whole GN iteration for a 6x6 system. The
    unrolled scalar form fuses into the surrounding program (~100 flops on
    the scalar unit). A is the robust GN normal matrix: symmetric positive
    definite whenever any correspondence is accepted, and the caller's
    Tikhonov floor keeps the pivots positive; a degenerate system yields
    non-finite entries that `gn_step`'s finiteness gate zeroes, exactly like
    the LU path did.
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j, j] - sum(L[j][k] * L[j][k] for k in range(j))
        L[j][j] = jnp.sqrt(d)
        for i in range(j + 1, n):
            s = A[i, j] - sum(L[i][k] * L[j][k] for k in range(j))
            L[i][j] = s / L[j][j]
    # Forward substitution L y = b, then back substitution L^T x = y.
    y = [None] * n
    for i in range(n):
        y[i] = (b[i] - sum(L[i][k] * y[k] for k in range(i))) / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        x[i] = (y[i] - sum(L[k][i] * x[k] for k in range(i + 1, n))) / L[i][i]
    return jnp.stack(x)


def gn_step(JTJ: jnp.ndarray, JTr: jnp.ndarray, n_corr) -> jnp.ndarray:
    """Solve JTJ dx = -JTr; returns zeros when the system is empty/singular."""
    eye = jnp.eye(6, dtype=JTJ.dtype)
    # Tiny Tikhonov floor keeps the f32 solve finite when correspondences are
    # degenerate; at typical scales it perturbs dx by < 1e-6.
    dx = _cholesky_solve6(JTJ + 1e-8 * eye, -JTr)
    ok = (n_corr > 0) & jnp.all(jnp.isfinite(dx))
    return jnp.where(ok, dx, jnp.zeros_like(dx))


def _conjugate_translation(T: jnp.ndarray, center: jnp.ndarray) -> jnp.ndarray:
    """T(center) @ T @ T(-center) without building the 4x4 translations."""
    out = T
    t_new = T[:3, 3] + center - T[:3, :3] @ center
    return out.at[:3, 3].set(t_new)


@full_precision
def geometric_icp_loop(
    grid: HashGrid,
    source0: jnp.ndarray,
    mask: jnp.ndarray,
    T_icp0: jnp.ndarray,
    center: jnp.ndarray,
    max_dist,
    kernel,
    max_iterations: int,
    estimation_threshold: float,
    it0,
    refresh_interval: int = REFRESH_INTERVAL,
    qfeats=None,
    merge_cache=None,
    rebuild_mode: str = "slabs",
):
    """Shared geometric GN loop (used by plain ICP, VFM-ICP phase 2, and —
    with `qfeats` — the XD descriptor-weighted path).

    `rebuild_mode` selects between two BIT-IDENTICAL champion-rebuild
    implementations (tie-break/sentinel parity pinned in
    tests/test_hash_grid.py), trading a per-epoch transpose against per-
    rebuild cost:
      * "slabs" (default): rebuild directly from the gathered slab layout —
        right for good-init rows that re-gather nearly every iteration
        (~1 rebuild per epoch, no transpose to amortize);
      * "planes": transpose the candidates once per epoch and run the
        single-pass kernel (`ops/champion_kernel`) per rebuild — ~2.5x
        cheaper rebuilds, right for long-running far-field rows whose lanes
        re-confirm convergence tens of times per epoch (the driver's
        vanilla-ICP row: 0.94 -> 0.58 s at B=16 on one v5e chip).
    TPU-only distinction; CPU always uses the XLA rebuild.

    `merge_cache` (optional callable NNCache -> NNCache) runs once per champion
    rebuild — the hook for MAP-SHARDED registration (`parallel.mesh
    .map_sharded_icp`): under `shard_map` each device's grid covers one shard
    of the map rows and the hook all_gathers the per-shard champion arrays
    into a [32*n_dev, N] cache. The champion-UNION contains the global NN
    (the global NN lives in some shard, and within that shard it is its
    voxel's champion), so merged refresh iterations are exact — the same
    exactness class as the single-grid cache. Incompatible with `qfeats`
    (the weighted cache carries per-champion weights; not merged).

    When `qfeats` [N, D] is given (D == the grid's descriptor dim), champion
    selection uses the reference's ACTIVE XD metric: squared distance scaled by
    `clamp(0.5*(1-cos), 0.01, 1.0)` when both sides carry nonzero descriptors
    (`VoxelHashMap.cpp:370-384`); acceptance stays plain Euclidean. The weights
    depend only on candidate identity, so they are computed once per slab-gather
    epoch and reused across GN iterations.

    Three nested `while_loop`s: the OUTER loop gathers the 27-voxel slab
    candidates (the expensive HBM gather, once per motion epoch); the MIDDLE
    loop rebuilds the per-voxel-champion cache from the KEPT slabs (cheap VPU
    reduce, no re-gather); the INNER loop runs up to `refresh_interval` GN
    iterations against the cached champions and EXITS as soon as any stop
    condition fires (under `vmap`, jax's while batching rule masks per-lane
    carry updates, so a converged lane idles while slower lanes in the batch
    finish) — termination picks the same iterate as a per-iteration-checked
    loop. Two guards make the cached candidates safe:

    * MOTION BOUND — each iteration adds a bound on how far any source point
      moved (|dt| + |omega| * r_max); once the accumulated motion since the
      GATHER exceeds half a voxel, the middle/inner loops exit and the outer
      loop re-gathers. Large-step (coarse) phases therefore re-gather nearly
      every iteration — the regime where any cached candidate set is stale —
      while converged phases run many cheap champion-only iterations.
    * FRESH-CONFIRMED TERMINATION — |dx| < threshold only terminates the loop
      when it happens on the FIRST iteration after a champion rebuild (an
      exact-NN iteration within the slab set). A sub-threshold step against
      stale champions instead ends the inner loop, the champions rebuild at
      the current position, and convergence is re-checked fresh — so the loop
      can never settle on a stale-cache fixed point.
    """

    def cond(state: _ICPState):
        return (state.it < max_iterations) & ~state.done & ~state.confirmed

    # Lever arm for the rotational part of the per-iteration motion bound.
    d2_from_center = jnp.sum(jnp.square(source0 - center), axis=-1)
    r_max = jnp.sqrt(jnp.max(jnp.where(mask, d2_from_center, 0.0)))
    slack = 0.5 * grid.voxel_size
    weighted = qfeats is not None
    if weighted and merge_cache is not None:
        raise ValueError("merge_cache is not supported on the XD weighted path")
    use_fused = jax.default_backend() == "tpu" and not weighted
    use_planes = use_fused and rebuild_mode == "planes"
    # Results are bit-identical for any unroll (frozen sub-steps are no-ops),
    # so the backend-dependent choice cannot cause TPU/CPU divergence; CPU
    # keeps 1 because its per-iteration overhead is negligible and frozen
    # sub-steps would only add wasted host compute.
    unroll = 4 if jax.default_backend() == "tpu" else 1

    def body(state: _ICPState) -> _ICPState:
        # One slab GATHER per epoch (the HBM-gather is the expensive part);
        # champion rebuilds between iterations reuse the kept slabs — valid
        # while accumulated motion since the gather stays below the half-voxel
        # slack (same approximation class as the champion cache itself: a
        # point that stays in its gather-time voxel sees the IDENTICAL
        # 27-bucket candidate set a fresh gather would return).
        cands = gather_candidate_slabs(grid, state.source, mask)
        # XD metric weights depend only on candidate identity — once per epoch.
        cand_w = candidate_weights(cands, grid.feats, qfeats) if weighted else None
        if use_planes:
            # One transpose per epoch -> every champion rebuild is a single
            # streaming pass (`ops/champion_kernel`); `group` trims the slab
            # sentinel pad (cap=20 -> 24 of 32 lanes read).
            group = min(-(-grid.max_points_per_voxel // 8) * 8, 32 * cands.slabs.shape[2])
            candsT = cands.planes(group)

        def mid_cond(carry):
            source, T_icp, dx_norm, it, done, confirmed, moved_g = carry
            return (
                (it < max_iterations) & ~done & ~confirmed & (moved_g < slack)
            )

        def mid_body(carry):
            source0_m, T0, dxn0, it0m, done0, conf0, moved_g0 = carry
            if weighted:
                cache = build_weighted_nn_cache(cands, cand_w, source0_m, mask)
            elif use_planes:
                from vfmreg_tpu.ops.champion_kernel import champions_from_planes

                cx, cy, cz = champions_from_planes(
                    *candsT, source0_m, mask, group=group
                )
                # rows are never read on the geometric path (zeros, see
                # champion_kernel docstring).
                cache = NNCache(cx=cx, cy=cy, cz=cz, rows=jnp.zeros(cx.shape, jnp.int32))
                if merge_cache is not None:
                    cache = merge_cache(cache)
            else:
                cache = build_nn_cache(cands, source0_m, mask)
                if merge_cache is not None:
                    cache = merge_cache(cache)

            def inner_live(c):
                source, T_icp, dx_norm, it, done, confirmed, moved_g, s = c
                return (
                    (s < refresh_interval)
                    & (it < max_iterations)
                    & ~done
                    & ~confirmed
                    & (moved_g < slack)
                    & ((s == 0) | (dx_norm >= estimation_threshold))
                )

            def one_gn_step(c):
                source, T_icp, dx_norm, it, done, confirmed, moved_g, s = c
                fresh = s == 0
                if use_fused:
                    # One streaming pass over the champion cache: NN +
                    # acceptance gate + robust normal equations
                    # (`ops/gn_kernel.py`).
                    from vfmreg_tpu.ops.gn_kernel import (
                        assemble_gn_system,
                        gn_moments_from_cache,
                    )

                    m = gn_moments_from_cache(
                        cache.cx, cache.cy, cache.cz, source, center, kernel, max_dist
                    )
                    JTJ, JTr, n_corr = assemble_gn_system(m)
                else:
                    if weighted:
                        nbr, dist, found = nn_from_weighted_cache(cache, source, mask)
                    else:
                        nbr, dist, found = nn_from_cache(cache, grid.points, source, mask)
                    accept = found & (dist < max_dist)
                    JTJ, JTr, n_corr = build_linear_system(
                        source, nbr, accept, kernel, center
                    )
                dx = gn_step(JTJ, JTr, n_corr)
                est_world = _conjugate_translation(exp_se3(dx), center)
                source = transform_points(source, est_world)
                T_icp = est_world @ T_icp
                dx_norm = jnp.linalg.norm(dx)
                confirmed = confirmed | (fresh & (dx_norm < estimation_threshold))
                moved_g = moved_g + jnp.linalg.norm(dx[:3]) + jnp.linalg.norm(dx[3:]) * r_max
                done = done | (n_corr == 0)
                return (source, T_icp, dx_norm, it + 1, done, confirmed, moved_g, s + 1)

            def inner(c):
                # UNROLL GN steps per while iteration: a while_loop iteration
                # carries ~1.2 ms of structural overhead on TPU (cond barrier +
                # batched-carry selects) while the GN math itself is ~0.4 ms —
                # amortizing the overhead over `unroll` steps is a ~2x speedup
                # on champion-cache-bound rows (the vanilla-ICP row). Each
                # sub-step is masked by its own liveness predicate (the same
                # conjunction the loop cond checks), so a frozen sub-step is a
                # no-op and the iterate SEQUENCE — hence the result — is
                # bit-identical to the unroll=1 loop.
                for _ in range(unroll):
                    live = inner_live(c)
                    c_new = one_gn_step(c)
                    c = jax.tree.map(
                        lambda a, b: jax.lax.select(
                            jnp.broadcast_to(live, a.shape) if a.ndim else live, a, b
                        ),
                        c_new,
                        c,
                    )
                return c

            out = jax.lax.while_loop(
                inner_live,
                inner,
                (source0_m, T0, dxn0, it0m, done0, conf0, moved_g0, jnp.int32(0)),
            )
            return out[:7]

        source, T_icp, dx_norm, it, done, confirmed, _ = jax.lax.while_loop(
            mid_cond,
            mid_body,
            (
                state.source,
                state.T_icp,
                state.dx_norm,
                state.it,
                state.done,
                state.confirmed,
                jnp.float32(0.0),
            ),
        )
        return _ICPState(source, T_icp, dx_norm, it, done, confirmed)

    init = _ICPState(
        source=source0,
        T_icp=T_icp0,
        dx_norm=jnp.float32(jnp.inf),
        it=jnp.asarray(it0, dtype=jnp.int32),
        done=jnp.asarray(False),
        confirmed=jnp.asarray(False),
    )
    return jax.lax.while_loop(cond, body, init)


@full_precision
def _register_frame_icp_state(
    grid: HashGrid,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    initial_guess: jnp.ndarray,
    max_correspondence_distance,
    kernel,
    max_iterations: int = MAX_NUM_ITERATIONS,
    estimation_threshold: float = ESTIMATION_THRESHOLD,
    refresh_interval: int = REFRESH_INTERVAL,
    merge_cache=None,
    rebuild_mode: str = "slabs",
):
    """`register_frame_icp` returning (pose, final _ICPState) — the state
    carries the iteration count and the convergence flags the two-phase
    batched dispatch compacts on."""
    points = points.astype(jnp.float32)
    initial_guess = initial_guess.astype(jnp.float32)
    source0 = transform_points(points, initial_guess)
    denom = jnp.maximum(jnp.sum(mask), 1)
    center = jnp.sum(jnp.where(mask[:, None], source0, 0.0), axis=0) / denom

    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    max_dist = jnp.asarray(max_correspondence_distance, dtype=jnp.float32)

    final = geometric_icp_loop(
        grid,
        source0,
        mask,
        jnp.eye(4, dtype=jnp.float32),
        center,
        max_dist,
        kernel,
        max_iterations,
        estimation_threshold,
        it0=0,
        refresh_interval=refresh_interval,
        merge_cache=merge_cache,
        rebuild_mode=rebuild_mode,
    )
    return final.T_icp @ initial_guess, final


@partial(
    jax.jit,
    static_argnames=("max_iterations", "refresh_interval", "merge_cache", "rebuild_mode"),
)
def register_frame_icp(
    grid: HashGrid,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    initial_guess: jnp.ndarray,
    max_correspondence_distance,
    kernel,
    max_iterations: int = MAX_NUM_ITERATIONS,
    estimation_threshold: float = ESTIMATION_THRESHOLD,
    refresh_interval: int = REFRESH_INTERVAL,
    merge_cache=None,
    rebuild_mode: str = "slabs",
) -> jnp.ndarray:
    """KISS-ICP `RegisterFrame` for 3D points (`Registration.cpp:145-195`).

    Args:
      grid: device voxel hash map of the target cloud.
      points: [N, 3] padded source points (sensor/scene frame).
      mask: [N] validity of the padding.
      initial_guess: [4, 4].
    Returns:
      [4, 4] final pose (T_icp @ initial_guess).
    """
    pose, _ = _register_frame_icp_state(
        grid, points, mask, initial_guess, max_correspondence_distance, kernel,
        max_iterations, estimation_threshold, refresh_interval, merge_cache,
        rebuild_mode,
    )
    return pose


@partial(
    jax.jit,
    static_argnames=("max_iterations", "refresh_interval", "merge_cache", "rebuild_mode"),
)
def register_frame_icp_stats(
    grid: HashGrid,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    initial_guess: jnp.ndarray,
    max_correspondence_distance,
    kernel,
    max_iterations: int = MAX_NUM_ITERATIONS,
    estimation_threshold: float = ESTIMATION_THRESHOLD,
    refresh_interval: int = REFRESH_INTERVAL,
    merge_cache=None,
    rebuild_mode: str = "slabs",
):
    """`register_frame_icp` plus (iterations, settled) — `settled` is true when
    the lane terminated on its own (fresh-confirmed convergence or the
    no-correspondence exit) rather than by exhausting `max_iterations`; a
    resumed dispatch from the returned pose continues the SAME GN trajectory
    up to the phase handoff's recentering (pose roundtrips through one 4x4
    multiply and the solve recenters at the new source centroid)."""
    pose, final = _register_frame_icp_state(
        grid, points, mask, initial_guess, max_correspondence_distance, kernel,
        max_iterations, estimation_threshold, refresh_interval, merge_cache,
        rebuild_mode,
    )
    return pose, final.it, final.done | final.confirmed


@partial(jax.jit, static_argnames=("max_iterations", "refresh_interval"))
@full_precision
def register_frame_icp_xd(
    grid: HashGrid,
    points: jnp.ndarray,
    feats: jnp.ndarray,
    mask: jnp.ndarray,
    initial_guess: jnp.ndarray,
    max_correspondence_distance,
    kernel,
    max_iterations: int = MAX_NUM_ITERATIONS,
    estimation_threshold: float = ESTIMATION_THRESHOLD,
    refresh_interval: int = REFRESH_INTERVAL,
) -> jnp.ndarray:
    """KISS-ICP `RegisterFrame` for XD points (`Registration.cpp:384-422`).

    Identical GN loop to the 3D path, but nearest-neighbor champion selection
    uses the reference's ACTIVE descriptor-weighted metric
    (`VoxelHashMap.cpp:370-384`): squared distance times
    `clamp(0.5*(1-cos), 0.01, 1.0)` when both the query and the candidate carry
    nonzero descriptor sums. Acceptance and the GN residuals stay purely
    geometric (the cosine accept-gate at `:425-433` is commented out in the
    reference). Live in the reference's descriptor-odometry mode
    (`ros/ros1/OdometryServer.cpp`, v2 `use_descriptors_=true`).

    Args:
      grid: device voxel hash map WITH descriptors (grid.feats [M, D]).
      points: [N, 3] padded source coordinates.
      feats: [N, D] padded source descriptors (D == grid descriptor dim).
      mask: [N] validity of the padding.
      initial_guess: [4, 4].
    Returns:
      [4, 4] final pose (T_icp @ initial_guess).
    """
    points = points.astype(jnp.float32)
    initial_guess = initial_guess.astype(jnp.float32)
    source0 = transform_points(points, initial_guess)
    denom = jnp.maximum(jnp.sum(mask), 1)
    center = jnp.sum(jnp.where(mask[:, None], source0, 0.0), axis=0) / denom

    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    max_dist = jnp.asarray(max_correspondence_distance, dtype=jnp.float32)

    final = geometric_icp_loop(
        grid,
        source0,
        mask,
        jnp.eye(4, dtype=jnp.float32),
        center,
        max_dist,
        kernel,
        max_iterations,
        estimation_threshold,
        it0=0,
        refresh_interval=refresh_interval,
        qfeats=feats.astype(jnp.float32),
    )
    return final.T_icp @ initial_guess
