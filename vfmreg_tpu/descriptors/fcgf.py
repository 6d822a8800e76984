"""FCGF extractor — `extract_fcgf_features` (`descriptors.py:86-115`)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from vfmreg_tpu.models.sparse_resunet import (
    FCGF_CONFIG,
    init_resunet_params,
    load_me_state_dict,
    resunet_forward,
)

_PARAMS = None


def _get_params():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    import jax

    path = os.environ.get("VFMREG_FCGF_WEIGHTS")
    if path and os.path.exists(path):
        import torch

        ckpt = torch.load(path, map_location="cpu")
        sd = ckpt.get("state_dict", ckpt)
        _PARAMS = load_me_state_dict({k: v.numpy() for k, v in sd.items()}, FCGF_CONFIG)
    else:
        _PARAMS = init_resunet_params(jax.random.PRNGKey(0), FCGF_CONFIG)
    return _PARAMS


def sparse_quantize(pcl: np.ndarray, voxel_size: float) -> Tuple[np.ndarray, np.ndarray]:
    """ME.utils.sparse_quantize semantics: floor-quantize, first index per voxel
    (`descriptors.py:100-104`). Returns (coords int32 [M,3], inds [M])."""
    coords = np.floor(np.asarray(pcl)[:, :3] / voxel_size).astype(np.int64)
    key = (
        (coords[:, 0] + (1 << 20))
        | ((coords[:, 1] + (1 << 20)) << 21)
        | ((coords[:, 2] + (1 << 20)) << 42)
    )
    _, first = np.unique(key, return_index=True)
    first = np.sort(first)
    return coords[first].astype(np.int32), first


def extract_fcgf_features(
    pcl: np.ndarray, voxel_size: float, weight_path: Optional[str] = None
) -> Tuple[np.ndarray, np.ndarray]:
    import jax.numpy as jnp

    from vfmreg_tpu.ops.voxel import bucket_size

    if weight_path is not None:
        os.environ.setdefault("VFMREG_FCGF_WEIGHTS", str(weight_path))
    params = _get_params()

    pcl = np.asarray(pcl)[:, :3]
    coords, inds = sparse_quantize(pcl, voxel_size)
    return_coords = pcl[inds]

    n = bucket_size(coords.shape[0])
    c = np.zeros((n, 3), dtype=np.int32)
    c[: coords.shape[0]] = coords
    mask = np.zeros((n,), dtype=bool)
    mask[: coords.shape[0]] = True
    feats = np.zeros((n, 1), dtype=np.float32)
    feats[: coords.shape[0]] = 1.0  # all-ones input features (`descriptors.py:95`)

    out = resunet_forward(params, jnp.asarray(c), jnp.asarray(feats), jnp.asarray(mask), FCGF_CONFIG)
    return return_coords.astype(np.float32), np.asarray(out)[: coords.shape[0]].astype(np.float64)
