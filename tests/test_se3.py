import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.geometry import se3


def random_se3(rng, scale_t=5.0):
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R.random(random_state=rng).as_matrix()
    T[:3, 3] = rng.uniform(-scale_t, scale_t, 3)
    return T


def test_exp_log_so3_roundtrip(rng):
    for _ in range(20):
        w = rng.uniform(-2, 2, 3)
        Rm = np.asarray(se3.exp_so3(jnp.asarray(w)))
        # Against scipy Rodrigues
        np.testing.assert_allclose(Rm, R.from_rotvec(w).as_matrix(), atol=1e-5)
        w_back = np.asarray(se3.log_so3(jnp.asarray(Rm)))
        np.testing.assert_allclose(w_back, w, atol=1e-4)


def test_exp_so3_small_angle():
    w = jnp.asarray([1e-9, -1e-9, 1e-9])
    Rm = np.asarray(se3.exp_so3(w))
    np.testing.assert_allclose(Rm, np.eye(3), atol=1e-6)


def test_exp_log_se3_roundtrip(rng):
    for _ in range(20):
        dx = rng.uniform(-1.5, 1.5, 6)
        T = np.asarray(se3.exp_se3(jnp.asarray(dx)))
        # Homogeneous structure
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-7)
        # Rotation part agrees with rotvec
        np.testing.assert_allclose(T[:3, :3], R.from_rotvec(dx[3:]).as_matrix(), atol=1e-5)
        dx_back = np.asarray(se3.log_se3(jnp.asarray(T)))
        np.testing.assert_allclose(dx_back, dx, atol=1e-4)


def test_exp_se3_composition_consistency(rng):
    # exp(dx) applied to a point == R p + t with t = V upsilon
    dx = jnp.asarray(rng.uniform(-1, 1, 6))
    T = se3.exp_se3(dx)
    p = jnp.asarray(rng.uniform(-3, 3, (5, 3)))
    q = se3.transform_points(p, T)
    q2 = p @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(np.asarray(q), q2, atol=1e-5)


def test_inverse_se3(rng):
    T = jnp.asarray(random_se3(rng))
    Ti = se3.inverse_se3(T)
    np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-6)


def test_orthogonalize_rotation(rng):
    Rm = R.random(random_state=rng).as_matrix() + rng.normal(0, 0.05, (3, 3))
    Ro = np.asarray(se3.orthogonalize_rotation(jnp.asarray(Rm)))
    np.testing.assert_allclose(Ro @ Ro.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(Ro) - 1.0) < 1e-5


def test_log_so3_near_pi():
    w = np.array([np.pi - 1e-5, 0.0, 0.0])
    Rm = R.from_rotvec(w).as_matrix()
    w_back = np.asarray(se3.log_so3(jnp.asarray(Rm)))
    np.testing.assert_allclose(w_back, w, atol=1e-3)


def test_log_so3_near_pi_dead_zone():
    """Angles in (pi - 1.414e-3, pi - 1e-3) previously fell between the
    near_pi_cos branch (sin neutralized) and the near_pi axis rewrite,
    returning |w| ~ 0.004 instead of ~pi."""
    from vfmreg_tpu.geometry.se3 import exp_so3, log_so3

    rng = np.random.RandomState(5)
    for delta in (9e-4, 1.1e-3, 1.2e-3, 1.35e-3, 1.5e-3, 5e-3):
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        w = jnp.asarray((np.pi - delta) * axis, dtype=jnp.float32)
        R = exp_so3(w)
        w_back = np.asarray(log_so3(R))
        np.testing.assert_allclose(
            np.linalg.norm(w_back), np.pi - delta, atol=5e-4,
            err_msg=f"delta={delta}",
        )
        # direction (sign-consistent with the input axis)
        np.testing.assert_allclose(
            w_back / np.linalg.norm(w_back), axis, atol=3e-3,
            err_msg=f"delta={delta}",
        )
