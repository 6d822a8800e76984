import numpy as np
import jax.numpy as jnp

from vfmreg_tpu.ops import voxel


def reference_voxel_down_sample(points, voxel_size):
    """First-point-wins downsample with C-truncation, as a python dict
    (mirrors `Preprocessing.cpp:50-70` semantics; set-of-points comparison)."""
    grid = {}
    for p in points:
        key = tuple(np.trunc(p / voxel_size).astype(np.int64))
        if key not in grid:
            grid[key] = p
    return np.stack(list(grid.values()))


def test_voxel_coords_truncation():
    pts = jnp.asarray([[-0.9, 0.9, -1.1], [0.1, -0.1, 2.5]], dtype=jnp.float32)
    c = np.asarray(voxel.voxel_coords(pts, 1.0))
    # C-style truncation toward zero: -0.9 -> 0, -1.1 -> -1
    np.testing.assert_array_equal(c, [[0, 0, -1], [0, 0, 2]])


def test_voxel_down_sample_matches_reference(rng):
    pts = rng.uniform(-20, 20, (2000, 3)).astype(np.float32)
    vs = 1.0
    ref = reference_voxel_down_sample(pts, vs)
    out_pts, _, out_mask = voxel.voxel_down_sample_masked(jnp.asarray(pts), vs)
    got = np.asarray(out_pts)[np.asarray(out_mask)]
    assert got.shape[0] == ref.shape[0]
    # Same set of representative points
    ref_set = {tuple(np.round(p, 5)) for p in ref}
    got_set = {tuple(np.round(p, 5)) for p in got}
    assert ref_set == got_set


def test_voxel_down_sample_first_wins():
    # Two points in the same voxel: the first in input order must survive.
    pts = jnp.asarray([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [1.5, 0.1, 0.1]], dtype=jnp.float32)
    out_pts, _, out_mask = voxel.voxel_down_sample_masked(pts, 1.0)
    got = np.asarray(out_pts)[np.asarray(out_mask)]
    assert got.shape[0] == 2
    assert np.any(np.all(np.isclose(got, [0.1, 0.1, 0.1]), axis=1))
    assert not np.any(np.all(np.isclose(got, [0.2, 0.2, 0.2]), axis=1))


def test_voxel_down_sample_respects_mask(rng):
    pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    mask = np.ones(100, dtype=bool)
    mask[50:] = False
    out_pts, _, out_mask = voxel.voxel_down_sample_masked(
        jnp.asarray(pts), 0.5, mask=jnp.asarray(mask)
    )
    got = np.asarray(out_pts)[np.asarray(out_mask)]
    ref = reference_voxel_down_sample(pts[:50], 0.5)
    assert got.shape[0] == ref.shape[0]


def test_voxel_down_sample_carries_feats(rng):
    pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    feats = rng.normal(size=(200, 8)).astype(np.float32)
    out_pts, out_feats, out_mask = voxel.voxel_down_sample_masked(
        jnp.asarray(pts), 0.5, feats=jnp.asarray(feats)
    )
    m = np.asarray(out_mask)
    # Each surviving point keeps its own feature row.
    for p, f in zip(np.asarray(out_pts)[m][:20], np.asarray(out_feats)[m][:20]):
        idx = np.argmin(np.linalg.norm(pts - p, axis=1))
        np.testing.assert_allclose(f, feats[idx], atol=1e-6)


def test_range_crop(rng):
    pts = rng.uniform(-30, 30, (500, 3)).astype(np.float32)
    mask = voxel.range_crop_masked(jnp.asarray(pts), max_range=20.0, min_range=5.0)
    norms = np.linalg.norm(pts, axis=1)
    np.testing.assert_array_equal(np.asarray(mask), (norms < 20.0) & (norms > 5.0))


def test_correct_kitti_scan():
    pts = jnp.asarray([[10.0, 0.0, 0.0]], dtype=jnp.float32)
    out = np.asarray(voxel.correct_kitti_scan(pts))
    # Rotating x-axis point about (x cross z) = -y axis by +0.205 DEG lifts z
    # by exactly 10*sin(0.205deg) — pins the magnitude and unit (a deg/rad
    # slip or factor-10 error would still pass a sign-only check).
    np.testing.assert_allclose(out[0, 2], 10.0 * np.sin(np.deg2rad(0.205)), rtol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(out), 10.0, rtol=1e-5)


def test_bucket_size():
    assert voxel.bucket_size(1) == 512
    assert voxel.bucket_size(512) == 512
    assert voxel.bucket_size(513) == 1024
    assert voxel.bucket_size(5000) == 8192
