"""Shape-dispatched `register_frame` with the reference signature.

Mirrors `kiss_icp/registration.py:28-73`:
  * [N, 3]         -> plain geometric ICP (`Registration.cpp:145-195`);
  * [N, 3+D] with D == the VFM descriptor size -> VFM-ICP
    (`Registration.cpp:197-382`), optionally returning the correspondence pair
    when `src_`/`tgt_` sentinels are passed;
  * [N, >3] otherwise -> XD path (`Registration.cpp:384-422`): the same GN
    loop on coordinates, but when the map stores same-dimension descriptors,
    nearest-neighbor champion selection uses the reference's ACTIVE
    cosine-weighted metric — squared distance times
    `clamp(0.5*(1-cos), 0.01, 1.0)` when both sides carry nonzero descriptors
    (`VoxelHashMap.cpp:370-384`; only the cosine accept-GATE at `:425-433` is
    commented out there). NOTE the asymmetry in the reference: the fixed-size
    Nd/VFM path's weighting is disabled (`VoxelHashMap.cpp:246`,
    `if (n_features > 0 && false)`), the XD path's is live.

The reference picks Nd-vs-XD by the compile-time `DESCRIPTOR_SIZE`
(`DescriptorSize.hpp:7`, via `_point_size()` at `registration.py:37`); here the
descriptor dim is a runtime parameter, so by default any [N, 3+D] whose D
matches the map's descriptor dim routes to VFM. Pass
`vfm_descriptor_size=384` for reference-exact dispatch (then a matching-D
cloud with D != 384 takes the weighted XD path, as it would upstream).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vfmreg_tpu.kiss.mapping import VoxelHashMap
from vfmreg_tpu.kiss.voxelization import voxel_down_sample
from vfmreg_tpu.ops.voxel import bucket_size
from vfmreg_tpu.registration.icp import register_frame_icp, register_frame_icp_xd
from vfmreg_tpu.registration.vfm_icp import register_frame_vfm

VFM_SOURCE_VOXEL = 5.0  # Registration.cpp:217
VFM_MIN_SOURCE_POINTS = 100  # Registration.cpp:218


def _pad(points: np.ndarray):
    import jax.numpy as jnp

    n = bucket_size(max(points.shape[0], 1))
    out = np.zeros((n, points.shape[1]), dtype=np.float32)
    out[: points.shape[0]] = points
    mask = np.zeros((n,), dtype=bool)
    mask[: points.shape[0]] = True
    return jnp.asarray(out), jnp.asarray(mask)


def register_frame(
    points: np.ndarray,
    voxel_map: VoxelHashMap,
    initial_guess: np.ndarray,
    max_correspondance_distance: float,
    kernel: float,
    src_: Optional[np.ndarray] = None,
    tgt_: Optional[np.ndarray] = None,
    vfm_descriptor_size: Optional[int] = None,
    force_xd: bool = False,
    two_phase: bool = False,
):
    import jax.numpy as jnp

    points = np.asarray(points)
    initial_guess = np.asarray(initial_guess, dtype=np.float64)
    if points.ndim != 2 or points.shape[1] < 3:
        raise ValueError("Invalid shape")

    if voxel_map.empty():
        # `RegisterFrame` returns the guess on an empty map (`Registration.cpp:150`)
        if points.shape[1] > 3 and src_ is not None:
            return initial_guess, src_, tgt_
        return initial_guess

    grid = voxel_map.device_grid()
    descriptor_dim = 0 if grid.feats is None else grid.feats.shape[1]
    D = points.shape[1] - 3
    is_vfm = D == descriptor_dim and D > 0
    if vfm_descriptor_size is not None:
        # Reference-exact dispatch: only the compile-time VFM dim routes Nd
        # (`registration.py:37`, `_point_size()`); everything else is XD.
        is_vfm = is_vfm and D == vfm_descriptor_size
    if force_xd:
        # The reference's C++ odometry server (v1/v2 modes) converts clouds to
        # VectorXd and ALWAYS registers through the XD overload
        # (`OdometryServer.cpp:77-95` -> `KissICP.cpp` VectorXd RegisterFrame
        # -> `Registration.cpp:384-422`) regardless of the descriptor dim —
        # the odometry path never runs VFM-ICP. KissICP.register_frame sets
        # this for its descriptor mode.
        is_vfm = False

    if not is_vfm:
        xyz, mask = _pad(np.ascontiguousarray(points[:, :3], dtype=np.float32))
        guess = jnp.asarray(initial_guess, dtype=jnp.float32)
        if D > 0 and D == descriptor_dim:
            # XD path with the reference's live cosine-weighted NN metric
            # (`Registration.cpp:384-422`, `VoxelHashMap.cpp:370-384`).
            fpad = np.zeros((xyz.shape[0], D), dtype=np.float32)
            fpad[: points.shape[0]] = points[:, 3:]
            pose = register_frame_icp_xd(
                grid,
                xyz,
                jnp.asarray(fpad),
                mask,
                guess,
                max_correspondance_distance,
                kernel,
            )
        elif two_phase:
            # Far-field two-phase split (`registration.icp
            # .FAR_FIELD_PHASE1_ITERATIONS`): the serial driver's vanilla row
            # replays the EXACT per-lane phase program of the batched two-phase
            # dispatch (`parallel.mesh.batched_icp_two_phase`) — phase 1 with
            # the phase-1 budget, then (only if the lane did not fresh-confirm)
            # a resume with the remaining budget from the phase-1 pose — so
            # serial-vs-batched rows stay bit-identical
            # (tests/test_harness.py::test_batched_driver_matches_serial).
            from vfmreg_tpu.registration.icp import (
                FAR_FIELD_PHASE1_ITERATIONS,
                MAX_NUM_ITERATIONS,
                register_frame_icp_stats,
            )

            pose, _, settled = register_frame_icp_stats(
                grid, xyz, mask, guess,
                max_correspondance_distance, kernel,
                max_iterations=FAR_FIELD_PHASE1_ITERATIONS,
            )
            if not bool(settled):
                pose = register_frame_icp(
                    grid, xyz, mask, jnp.asarray(pose),
                    max_correspondance_distance, kernel,
                    max_iterations=MAX_NUM_ITERATIONS
                    - FAR_FIELD_PHASE1_ITERATIONS,
                )
        else:
            # 3D path — or XD whose dim the map cannot weight (the map stores
            # no / different-dim descriptors; weight degenerates to 1.0).
            pose = register_frame_icp(
                grid,
                xyz,
                mask,
                guess,
                max_correspondance_distance,
                kernel,
            )
        return np.asarray(pose, dtype=np.float64)

    # ---------------------------------------------------------------- VFM path
    do_return = src_ is not None and tgt_ is not None

    # Transform by the guess, heavily voxelize for the correspondence search.
    xyz = points[:, :3] @ initial_guess[:3, :3].T + initial_guess[:3, 3]
    source_nd = np.c_[xyz.astype(np.float32), points[:, 3:]]
    voxelized = voxel_down_sample(source_nd, VFM_SOURCE_VOXEL)
    if voxelized.shape[0] < VFM_MIN_SOURCE_POINTS:
        voxelized = source_nd  # `Registration.cpp:218-221`

    from vfmreg_tpu.ops.matching import get_vfm_correspondences as _vfm

    q, qmask = _pad(voxelized)
    corr = _vfm(
        grid.points,
        grid.feats,
        grid.valid,
        q[:, :3],
        q[:, 3:],
        qmask,
        min_cosine_similarity=0.8,  # Registration.cpp:215
    )

    frame_xyz, frame_mask = _pad(np.ascontiguousarray(points[:, :3], dtype=np.float32))
    pose, src_out, tgt_out, corr_mask = register_frame_vfm(
        grid,
        frame_xyz,
        frame_mask,
        corr,
        jnp.asarray(initial_guess, dtype=jnp.float32),
        max_correspondance_distance,
        kernel,
    )
    pose = np.asarray(pose, dtype=np.float64)
    if do_return:
        m = np.asarray(corr_mask)
        return pose, np.asarray(src_out)[m], np.asarray(tgt_out)[m]
    return pose
