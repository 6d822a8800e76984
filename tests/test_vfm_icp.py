"""End-to-end synthetic slice: descriptor cloud -> VFM correspondences ->
VFM-ICP (MAD-filtered GN + geometric refinement) recovers a large misalignment
that pure geometric ICP cannot."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.geometry.se3 import inverse_se3, transform_points
from vfmreg_tpu.ops.hash_grid import build_hash_grid
from vfmreg_tpu.ops.matching import get_vfm_correspondences
from vfmreg_tpu.registration.vfm_icp import register_frame_vfm
from vfmreg_tpu.registration.icp import register_frame_icp


def make_descriptor_scene(rng, n=1500, d=32, extent=40.0):
    """Structured scene where each point's descriptor encodes its (coarse) position,
    mimicking visually distinctive DINOv2 features."""
    pts = np.c_[
        rng.uniform(-extent, extent, (n, 2)),
        rng.uniform(0, 6, (n, 1)),
    ].astype(np.float32)
    # Descriptor: smooth random projection of position -> locally distinctive
    W = rng.normal(size=(3, d)).astype(np.float32)
    feats = np.sin(pts @ W * 0.15).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    return pts, feats


@pytest.mark.slow
def test_vfm_icp_recovers_large_offset(rng):
    pts, feats = make_descriptor_scene(rng)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = R.from_euler("z", 25, degrees=True).as_matrix()
    T_true[:3, 3] = [12.0, -9.0, 0.3]

    scan_pts = np.asarray(transform_points(jnp.asarray(pts), inverse_se3(jnp.asarray(T_true))))
    scan_mask = jnp.ones(pts.shape[0], dtype=bool)

    grid = build_hash_grid(jnp.asarray(pts), 1.0, feats=jnp.asarray(feats))

    corr = get_vfm_correspondences(
        grid.points,
        grid.feats,
        grid.valid,
        jnp.asarray(scan_pts),
        jnp.asarray(feats),  # descriptors ride along with the points
        scan_mask,
        min_cosine_similarity=0.8,
        chunk=512,
    )
    assert int(corr.count) > 100

    pose, _, _, _ = register_frame_vfm(
        grid,
        jnp.asarray(scan_pts),
        scan_mask,
        corr,
        jnp.eye(4),
        max_correspondence_distance=3.0,
        kernel=0.5,
    )
    got = np.asarray(pose)
    assert np.linalg.norm(got[:3, 3] - T_true[:3, 3]) < 0.3
    cos = np.clip((np.trace(got[:3, :3].T @ T_true[:3, :3]) - 1) / 2, -1, 1)
    assert np.rad2deg(np.arccos(cos)) < 1.0

    # Sanity: plain geometric ICP from identity can NOT recover this offset.
    pose_geo = register_frame_icp(
        grid, jnp.asarray(scan_pts), scan_mask, jnp.eye(4), 3.0, 0.5
    )
    assert np.linalg.norm(np.asarray(pose_geo)[:3, 3] - T_true[:3, 3]) > 2.0


def test_vfm_icp_with_no_correspondences_falls_back(rng):
    pts, feats = make_descriptor_scene(rng, n=500)
    grid = build_hash_grid(jnp.asarray(pts), 1.0, feats=jnp.asarray(feats))
    scan_mask = jnp.ones(pts.shape[0], dtype=bool)
    # Orthogonal descriptors -> zero VFM correspondences -> pure geometric phase.
    bad_feats = np.roll(feats, 7, axis=1) * 0.0
    corr = get_vfm_correspondences(
        grid.points, grid.feats, grid.valid,
        jnp.asarray(pts), jnp.asarray(bad_feats), scan_mask,
        chunk=512,
    )
    assert int(corr.count) == 0
    pose, _, _, _ = register_frame_vfm(
        grid, jnp.asarray(pts), scan_mask, corr, jnp.eye(4), 3.0, 0.5
    )
    np.testing.assert_allclose(np.asarray(pose), np.eye(4), atol=5e-3)
