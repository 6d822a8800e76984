import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.models.spinnet import (
    get_voxel_coordinate,
    init_spinnet_params,
    spinnet_forward,
    var_to_invar,
)

# Tiny config for CPU tests (real: 9/60/30).
RAD, AZI, ELE = 9, 12, 20  # rad=9: 4 k3 Conv3d shrink 9->1; ele>16 for the d=16 conv


def test_voxel_coordinate_shells():
    grid = get_voxel_coordinate(2.0, RAD, AZI, ELE)
    assert grid.shape == (RAD * ELE * AZI, 3)
    r = np.linalg.norm(grid.reshape(RAD, -1, 3), axis=-1)
    # Radial shells at (i + 0.5)/rad_n * radius
    for i in range(RAD):
        np.testing.assert_allclose(r[i], 2.0 * (i + 0.5) / RAD, atol=1e-6)


def test_var_to_invar_rotation_alignment(rng):
    # Rotating the input cloud about z by one azimuth step permutes azimuth bins
    # but leaves the canonicalized per-bin coords identical.
    pts = rng.normal(size=(1, RAD * ELE * AZI, 5, 3)).astype(np.float32)
    out = np.asarray(var_to_invar(jnp.asarray(pts), RAD, AZI, ELE))
    assert out.shape == pts.shape
    # bin 0 unrotated
    np.testing.assert_allclose(out.reshape(1, RAD, ELE, AZI, 5, 3)[0, 0, 0, 0],
                               pts.reshape(1, RAD, ELE, AZI, 5, 3)[0, 0, 0, 0], atol=1e-6)
    # The property itself (binds every bin, not just the identity bin 0):
    # rotate the cloud about z by one azimuth step and shift bin assignment by
    # one — the canonicalized per-bin coords must be IDENTICAL, rolled.
    step = 2.0 * np.pi / AZI
    c, s = np.cos(step), np.sin(step)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    binned = pts.reshape(1, RAD, ELE, AZI, 5, 3)
    rolled = np.roll(binned @ Rz.T, shift=1, axis=3)
    out2 = np.asarray(
        var_to_invar(jnp.asarray(rolled.reshape(pts.shape)), RAD, AZI, ELE)
    ).reshape(1, RAD, ELE, AZI, 5, 3)
    np.testing.assert_allclose(
        out2, np.roll(out.reshape(1, RAD, ELE, AZI, 5, 3), shift=1, axis=3), atol=1e-4
    )


def _forward(params, patches, grid):
    return np.asarray(
        spinnet_forward(
            params, patches, grid, rad_n=RAD, azi_n=AZI, ele_n=ELE,
            voxel_r=0.5, voxel_sample=8,
        )
    )


def test_spinnet_forward_shapes(rng):
    params = init_spinnet_params(jax.random.PRNGKey(0))
    grid = jnp.asarray(get_voxel_coordinate(2.0, RAD, AZI, ELE), dtype=jnp.float32)
    patches = jnp.asarray(rng.uniform(-2, 2, (2, 256, 3)).astype(np.float32))
    out = _forward(params, patches, grid)
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(out))


def test_spinnet_z_rotation_invariance(rng):
    """The cylindrical construction makes descriptors invariant to rotations
    about z up to azimuth-bin discretization (even with random weights)."""
    params = init_spinnet_params(jax.random.PRNGKey(0))
    grid = jnp.asarray(get_voxel_coordinate(2.0, RAD, AZI, ELE), dtype=jnp.float32)
    patch = rng.uniform(-1.5, 1.5, (1, 256, 3)).astype(np.float32)
    patch[:, -1] = 0.0  # center at origin
    Rm = R.from_euler("z", 360.0 / AZI, degrees=True).as_matrix().astype(np.float32)
    patch_rot = patch @ Rm.T
    f0 = _forward(params, jnp.asarray(patch), grid)
    f1 = _forward(params, jnp.asarray(patch_rot), grid)
    cos = (f0 * f1).sum() / (np.linalg.norm(f0) * np.linalg.norm(f1))
    assert cos > 0.99
