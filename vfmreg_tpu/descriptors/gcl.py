"""GCL extractor — `extract_gcl_features` (`descriptors.py:149-178`):
ResUNetFatBN at 0.3 voxel, all-ones input features, normalized output."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from vfmreg_tpu.descriptors.fcgf import sparse_quantize
from vfmreg_tpu.models.sparse_resunet import (
    GCL_CONFIG,
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

    path = os.environ.get("VFMREG_GCL_WEIGHTS")
    if path and os.path.exists(path):
        import torch

        ckpt = torch.load(path, map_location="cpu")
        sd = ckpt.get("state_dict", ckpt)
        _PARAMS = load_me_state_dict({k: v.numpy() for k, v in sd.items()}, GCL_CONFIG)
    else:
        _PARAMS = init_resunet_params(jax.random.PRNGKey(0), GCL_CONFIG)
    return _PARAMS


def extract_gcl_features(
    pcl: np.ndarray, voxel_size: float, weight_path: Optional[str] = None
) -> Tuple[np.ndarray, np.ndarray]:
    import jax.numpy as jnp

    from vfmreg_tpu.ops.voxel import bucket_size

    if weight_path is not None:
        os.environ.setdefault("VFMREG_GCL_WEIGHTS", str(weight_path))
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
    feats[: coords.shape[0]] = 1.0

    out = resunet_forward(params, jnp.asarray(c), jnp.asarray(feats), jnp.asarray(mask), GCL_CONFIG)
    return return_coords.astype(np.float32), np.asarray(out)[: coords.shape[0]].astype(np.float64)
