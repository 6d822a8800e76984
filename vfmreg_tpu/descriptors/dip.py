"""DIP extractor — `extract_dip_features` (`descriptors.py:45-83`)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from vfmreg_tpu.models.dip import (
    LRF_KERNEL,
    compute_lrf_patches,
    dip_forward,
    init_dip_params,
    load_dip_state_dict,
)

_PARAMS = None


def _get_params():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    import jax

    path = os.environ.get("VFMREG_DIP_WEIGHTS")
    if path and os.path.exists(path):
        import torch

        sd = torch.load(path, map_location="cpu")
        _PARAMS = load_dip_state_dict({k: v.numpy() for k, v in sd.items()})
    else:
        # Random weights: shapes/pipeline work end-to-end; real descriptors need
        # the reference checkpoint (dip/final_chkpt.pth) via VFMREG_DIP_WEIGHTS.
        _PARAMS = init_dip_params(jax.random.PRNGKey(0))
    return _PARAMS


def extract_dip_features(
    pcl: np.ndarray, voxel_size: float, weight_path: Optional[str] = None, batch_size: int = 512
) -> Tuple[np.ndarray, np.ndarray]:
    """Voxel downsample -> LRF patches (kernel 0.6*sqrt(3), 256 pts) -> PointNet."""
    import jax
    import jax.numpy as jnp

    from vfmreg_tpu.kiss.voxelization import voxel_down_sample
    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.ops.knn import radius_knn
    from vfmreg_tpu.ops.voxel import bucket_size

    if weight_path is not None:
        os.environ.setdefault("VFMREG_DIP_WEIGHTS", str(weight_path))
    params = _get_params()

    down = voxel_down_sample(np.asarray(pcl)[:, :3], voxel_size).astype(np.float32)
    n = bucket_size(down.shape[0])
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[: down.shape[0]] = down
    mask = np.zeros((n,), dtype=bool)
    mask[: down.shape[0]] = True
    jpts, jmask = jnp.asarray(pts), jnp.asarray(mask)

    grid = build_hash_grid(jpts, LRF_KERNEL, mask=jmask, max_points_per_voxel=24)
    knn = radius_knn(grid, jpts, jmask, k=384, radius=LRF_KERNEL)
    # Map grid indices back to input rows via the grid's stable hash sort
    # (shared helper — the contract must match the grid build exactly).
    from vfmreg_tpu.descriptors.fpfh import _grid_input_order

    order = _grid_input_order(jpts, jmask, grid.voxel_size)
    nbr_idx = order[knn.idx]

    patches, _ = compute_lrf_patches(
        jpts, jmask, nbr_idx, knn.mask, jax.random.PRNGKey(0)
    )

    descs = []
    for b in range(0, n, batch_size):
        descs.append(np.asarray(dip_forward(params, patches[b : b + batch_size])))
    feats = np.concatenate(descs)[: down.shape[0]]
    return down.astype(np.float64), feats.astype(np.float64)
