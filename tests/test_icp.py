import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.geometry.se3 import transform_points, inverse_se3
from vfmreg_tpu.ops.hash_grid import build_hash_grid
from vfmreg_tpu.registration.icp import register_frame_icp
from vfmreg_tpu.registration.procrustes import kabsch, weighted_kabsch


def make_scene(rng, n=2000, extent=30.0):
    # A structured cloud (not uniform noise) so ICP has gradients: two walls + floor
    floor = np.c_[rng.uniform(-extent, extent, (n // 2, 2)), 0.05 * rng.normal(size=(n // 2, 1))]
    wall1 = np.c_[
        rng.uniform(-extent, extent, (n // 4, 1)),
        np.full((n // 4, 1), extent / 2) + 0.05 * rng.normal(size=(n // 4, 1)),
        rng.uniform(0, 5, (n // 4, 1)),
    ]
    wall2 = np.c_[
        np.full((n // 4, 1), -extent / 3) + 0.05 * rng.normal(size=(n // 4, 1)),
        rng.uniform(-extent, extent, (n // 4, 1)),
        rng.uniform(0, 5, (n // 4, 1)),
    ]
    return np.concatenate([floor, wall1, wall2]).astype(np.float32)


def small_perturbation(rng, trans=0.5, rot_deg=3.0):
    T = np.eye(4)
    T[:3, :3] = R.from_euler("xyz", rng.uniform(-rot_deg, rot_deg, 3), degrees=True).as_matrix()
    T[:3, 3] = rng.uniform(-trans, trans, 3)
    return T.astype(np.float32)


@pytest.mark.slow
def test_icp_recovers_identity(rng):
    pts = make_scene(rng)
    grid = build_hash_grid(jnp.asarray(pts), 1.0)
    mask = jnp.ones(pts.shape[0], dtype=bool)
    pose = register_frame_icp(
        grid, jnp.asarray(pts), mask, jnp.eye(4), max_correspondence_distance=3.0, kernel=1.0
    )
    # Not exactly identity: the 20-points-per-voxel cap (same as the reference)
    # means dense-voxel points may match a ~0.1 m neighbor instead of themselves.
    np.testing.assert_allclose(np.asarray(pose), np.eye(4), atol=5e-3)


def test_icp_converges_from_perturbation(rng):
    pts = make_scene(rng)
    T_true = small_perturbation(rng)
    # Map = scene at identity; scan = scene moved by inv(T_true): registering scan
    # against map should recover T_true.
    scan = transform_points(jnp.asarray(pts), inverse_se3(jnp.asarray(T_true)))
    grid = build_hash_grid(jnp.asarray(pts), 1.0)
    mask = jnp.ones(pts.shape[0], dtype=bool)
    pose = register_frame_icp(
        grid, scan, mask, jnp.eye(4), max_correspondence_distance=3.0, kernel=0.5
    )
    got = np.asarray(pose)
    assert np.linalg.norm(got[:3, 3] - T_true[:3, 3]) < 0.05
    cos = np.clip((np.trace(got[:3, :3].T @ T_true[:3, :3]) - 1) / 2, -1, 1)
    assert np.rad2deg(np.arccos(cos)) < 0.5


def test_icp_far_from_origin(rng):
    # f32 conditioning check: same scene shifted 300 m from the origin.
    # The perturbation rotates about the scene center (a world-origin rotation
    # would displace the far scene by |c| sin(theta) ~ 13 m — unregistrable).
    offset = np.array([300.0, -250.0, 40.0], dtype=np.float32)
    pts = make_scene(rng) + offset
    P = small_perturbation(rng, trans=0.3, rot_deg=2.0)
    C, Cinv = np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32)
    C[:3, 3], Cinv[:3, 3] = offset, -offset
    T_true = (C @ P @ Cinv).astype(np.float32)
    scan = transform_points(jnp.asarray(pts), inverse_se3(jnp.asarray(T_true)))
    grid = build_hash_grid(jnp.asarray(pts), 1.0)
    mask = jnp.ones(pts.shape[0], dtype=bool)
    pose = register_frame_icp(
        grid, scan, mask, jnp.eye(4), max_correspondence_distance=3.0, kernel=0.5
    )
    got = np.asarray(pose)
    assert np.linalg.norm(got[:3, 3] - T_true[:3, 3]) < 0.1


def test_icp_respects_initial_guess(rng):
    pts = make_scene(rng)
    T_true = small_perturbation(rng, trans=5.0, rot_deg=10.0)
    scan = transform_points(jnp.asarray(pts), inverse_se3(jnp.asarray(T_true)))
    grid = build_hash_grid(jnp.asarray(pts), 1.0)
    mask = jnp.ones(pts.shape[0], dtype=bool)
    # With the true pose as guess, ICP should stay there.
    pose = register_frame_icp(
        grid, scan, mask, jnp.asarray(T_true), max_correspondence_distance=3.0, kernel=0.5
    )
    got = np.asarray(pose)
    assert np.linalg.norm(got[:3, 3] - T_true[:3, 3]) < 0.05


def test_icp_empty_map_returns_guess(rng):
    pts = make_scene(rng, n=100)
    grid = build_hash_grid(jnp.asarray(pts), 1.0, mask=jnp.zeros(pts.shape[0], dtype=bool))
    guess = small_perturbation(rng)
    pose = register_frame_icp(
        grid,
        jnp.asarray(pts),
        jnp.ones(pts.shape[0], dtype=bool),
        jnp.asarray(guess),
        max_correspondence_distance=3.0,
        kernel=0.5,
    )
    np.testing.assert_allclose(np.asarray(pose), guess, atol=1e-5)


def test_kabsch_exact(rng):
    src = rng.uniform(-5, 5, (50, 3))
    T = np.eye(4)
    T[:3, :3] = R.random(random_state=rng).as_matrix()
    T[:3, 3] = rng.uniform(-3, 3, 3)
    tgt = src @ T[:3, :3].T + T[:3, 3]
    T_est = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_allclose(T_est, T, atol=1e-5)


def test_weighted_kabsch_ignores_outliers(rng):
    src = rng.uniform(-5, 5, (50, 3))
    T = np.eye(4)
    T[:3, :3] = R.random(random_state=rng).as_matrix()
    T[:3, 3] = rng.uniform(-3, 3, 3)
    tgt = src @ T[:3, :3].T + T[:3, 3]
    tgt[:10] += rng.uniform(-50, 50, (10, 3))  # corrupt
    w = np.ones(50)
    w[:10] = 0.0
    T_est = np.asarray(weighted_kabsch(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w)))
    np.testing.assert_allclose(T_est, T, atol=1e-5)


def test_kabsch_batched(rng):
    src = rng.uniform(-5, 5, (4, 30, 3))
    Ts = []
    tgts = []
    for b in range(4):
        T = np.eye(4)
        T[:3, :3] = R.random(random_state=rng).as_matrix()
        T[:3, 3] = rng.uniform(-2, 2, 3)
        Ts.append(T)
        tgts.append(src[b] @ T[:3, :3].T + T[:3, 3])
    T_est = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(np.stack(tgts))))
    np.testing.assert_allclose(T_est, np.stack(Ts), atol=1e-5)
