"""GeDi extractor — `extract_gedi_features` (`descriptors.py:118-146`)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from vfmreg_tpu.models.gedi import gedi_forward, gedi_lrf_patches, init_gedi_params, load_gedi_state_dict

R_LRF = 0.5
SAMPLES_PER_PATCH_LRF = 4000  # capped by the hash-grid candidate budget below
SAMPLES_PER_PATCH_OUT = 512
BATCH = 256  # reference uses 250; power of two keeps jit shapes stable

_PARAMS = None


def _get_params():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    import jax

    path = os.environ.get("VFMREG_GEDI_WEIGHTS")
    if path and os.path.exists(path):
        import torch

        ckpt = torch.load(path, map_location="cpu")
        sd = ckpt.get("pnet_model_state_dict", ckpt)
        _PARAMS = load_gedi_state_dict({k: v.numpy() for k, v in sd.items()})
    else:
        _PARAMS = init_gedi_params(jax.random.PRNGKey(0))
    return _PARAMS


def extract_gedi_features(
    pcl: np.ndarray,
    voxel_size: float,
    n_points=np.inf,
    weight_path: Optional[str] = None,
    batch_size: int = BATCH,
) -> Tuple[np.ndarray, np.ndarray]:
    """Voxel downsample -> r=0.5 neighborhoods -> LRF canonicalize (512 pts) ->
    PointNet++ SSG -> 32-d descriptors."""
    import jax
    import jax.numpy as jnp

    from vfmreg_tpu.kiss.voxelization import voxel_down_sample
    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.ops.knn import radius_knn
    from vfmreg_tpu.ops.voxel import bucket_size

    if weight_path is not None:
        os.environ.setdefault("VFMREG_GEDI_WEIGHTS", str(weight_path))
    params = _get_params()

    down = voxel_down_sample(np.asarray(pcl)[:, :3], voxel_size).astype(np.float32)
    if np.isfinite(n_points) and down.shape[0] > n_points:
        sel = np.random.RandomState(0).choice(down.shape[0], int(n_points), replace=False)
        down = down[sel]

    n = bucket_size(down.shape[0])
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[: down.shape[0]] = down
    mask = np.zeros((n,), dtype=bool)
    mask[: down.shape[0]] = True
    jpts, jmask = jnp.asarray(pts), jnp.asarray(mask)

    # In-radius neighborhood samples (capped; the reference random-samples 4000
    # of all in-radius points, `gedi.py:199-215`).
    k = 768
    grid = build_hash_grid(jpts, R_LRF, mask=jmask, max_points_per_voxel=32)
    knn = radius_knn(grid, jpts, jmask, k=k, radius=R_LRF)
    nbr_pts = grid.points[knn.idx]  # [N, k, 3]

    descs = []
    key = jax.random.PRNGKey(0)
    for b in range(0, n, batch_size):
        key, k1, k2 = jax.random.split(key, 3)
        patches = gedi_lrf_patches(
            jpts[b : b + batch_size],
            nbr_pts[b : b + batch_size],
            knn.mask[b : b + batch_size],
            k1,
            r_lrf=R_LRF,
            samples_per_patch_out=SAMPLES_PER_PATCH_OUT,
        )
        descs.append(np.asarray(gedi_forward(params, patches)))
    feats = np.concatenate(descs)[: down.shape[0]]
    return down.astype(np.float64), feats.astype(np.float64)
