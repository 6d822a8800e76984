"""Flagship scan-to-map registration on a synthetic world (CPU-runnable).

Builds a descriptor-carrying map, misaligns a scan by a known SE(3) offset,
and recovers it through the headline method: cosine 1-NN correspondences ->
VFM-ICP -> geometric refinement. Mirrors the reference flow
`registration_node.py` (vfm row) on fabricated data; no datasets or weights
needed.

    python examples/register_synthetic.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root run

import jax

jax.config.update("jax_platforms", "cpu")  # remote-TPU plugins override env vars

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.geometry.metrics import compute_errors
from vfmreg_tpu.geometry.se3 import inverse_se3, transform_points
from vfmreg_tpu.ops.hash_grid import build_hash_grid
from vfmreg_tpu.ops.matching import get_vfm_correspondences
from vfmreg_tpu.registration.ransac import ransac_registration
from vfmreg_tpu.registration.vfm_icp import register_frame_vfm


def main():
    rng = np.random.RandomState(7)
    n, d = 4000, 64

    # A synthetic "map": planar-ish world with position-derived descriptors
    # standing in for projected DINOv2 features (consistent across views).
    pts = np.c_[rng.uniform(-50, 50, (n, 2)), rng.uniform(0, 8, (n, 1))].astype(np.float32)
    feats = np.sin(pts @ rng.normal(size=(3, d)).astype(np.float32) * 0.1).astype(np.float32)

    # Misalign a scan by a known offset (the quantity to recover).
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R.from_euler("z", 35, degrees=True).as_matrix()
    T_gt[:3, 3] = [18.0, -12.0, 0.4]
    scan = np.asarray(transform_points(jnp.asarray(pts), inverse_se3(jnp.asarray(T_gt))))
    mask = jnp.ones(n, dtype=bool)

    # 1. Device voxel-hash map over the target cloud (descriptors attached).
    grid = build_hash_grid(jnp.asarray(pts), voxel_size=1.0, feats=jnp.asarray(feats))

    # 2. Descriptor-space cosine 1-NN correspondences, scan -> map.
    corr = get_vfm_correspondences(
        grid.points, grid.feats, grid.valid, jnp.asarray(scan), jnp.asarray(feats), mask
    )
    print(f"correspondences: {int(corr.count)} (mean cos {float(corr.mean_similarity):.3f})")

    # 3a. RANSAC on the correspondences (the paper's vfm+RANSAC row) ...
    res = ransac_registration(corr.source, corr.target, corr.mask, jax.random.PRNGKey(0))
    rte, rre = compute_errors(np.asarray(res.pose, np.float64), T_gt.astype(np.float64))
    print(f"RANSAC:  RTE {rte:.3f} m  RRE {rre:.3f} deg")

    # 3b. ... and VFM-ICP + geometric refinement (sigma=2: max_dist 6, kernel 2/3).
    pose, *_ = register_frame_vfm(
        grid, jnp.asarray(scan), mask, corr, jnp.eye(4), 6.0, 0.667
    )
    rte, rre = compute_errors(np.asarray(pose, np.float64), T_gt.astype(np.float64))
    print(f"VFM-ICP: RTE {rte:.3f} m  RRE {rre:.3f} deg")
    assert rte < 0.6 and rre < 1.5, "missed the paper's recall gate"
    print("recovered the planted offset within the paper's recall gate (0.6 m / 1.5 deg)")


if __name__ == "__main__":
    main()
