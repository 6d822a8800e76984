"""SpinNet extractor — `extract_spinnet_features` (`descriptors.py:181-235`)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from vfmreg_tpu.models.spinnet import (
    get_voxel_coordinate,
    init_spinnet_params,
    load_spinnet_state_dict,
    spinnet_forward,
)

VICINITY = 2.0  # descriptors.py:186
RAD_N, AZI_N, ELE_N = 9, 60, 30
VOXEL_R, VOXEL_SAMPLE = 0.3, 30
POINTS_PER_PATCH = 2048  # descriptors.py:217

_PARAMS = None


def _get_params():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    import jax

    path = os.environ.get("VFMREG_SPINNET_WEIGHTS")
    if path and os.path.exists(path):
        import torch

        sd = torch.load(path, map_location="cpu")
        _PARAMS = load_spinnet_state_dict({k: v.numpy() for k, v in sd.items()})
    else:
        _PARAMS = init_spinnet_params(jax.random.PRNGKey(0))
    return _PARAMS


def extract_spinnet_features(
    pcl: np.ndarray,
    n_points: int,
    weight_path: Optional[str] = None,
    batch_size: int = 8,  # ball-query dist matrix is ~132MB per patch
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random keypoints (<= n_points) -> 2 m ball patches (2048 pts, ball-query
    semantics incl. center-replacement padding) -> cylindrical net descriptors."""
    import jax.numpy as jnp

    from vfmreg_tpu.ops.pointnet2 import ball_query

    if weight_path is not None:
        os.environ.setdefault("VFMREG_SPINNET_WEIGHTS", str(weight_path))
    params = _get_params()

    pcl = np.ascontiguousarray(np.asarray(pcl)[:, :3], dtype=np.float32)
    if pcl.shape[0] > n_points:
        idx = np.random.RandomState(seed).choice(pcl.shape[0], n_points, replace=False)
        keypoints = pcl[idx]
    else:
        keypoints = pcl

    grid_pts = jnp.asarray(get_voxel_coordinate(VICINITY, RAD_N, AZI_N, ELE_N), dtype=jnp.float32)

    # select_patches (`descriptors.py:199-214`): ball query on the full cloud,
    # padding slots replaced by the keypoint itself, slot -1 forced to keypoint.
    jp = jnp.asarray(pcl)[None]
    descs = []
    for b in range(0, keypoints.shape[0], batch_size):
        kp = jnp.asarray(keypoints[b : b + batch_size])[None]
        gidx = ball_query(VICINITY, POINTS_PER_PATCH, jp, kp)[0]  # [B, P]
        patch = jnp.asarray(pcl)[gidx]  # [B, P, 3]
        pad = gidx == gidx[:, 0:1]
        pad = pad.at[:, 0].set(False)
        pad = pad.at[:, -1].set(True)
        patch = jnp.where(pad[..., None], kp[0][:, None, :], patch)
        d = spinnet_forward(
            params, patch, grid_pts,
            rad_n=RAD_N, azi_n=AZI_N, ele_n=ELE_N,
            voxel_r=VOXEL_R, voxel_sample=VOXEL_SAMPLE,
        )
        descs.append(np.asarray(d))
    feats = np.concatenate(descs)
    return keypoints.astype(np.float64), feats.astype(np.float64)
