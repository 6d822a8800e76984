"""SE(3) / SO(3) utilities in pure JAX.

Replaces the reference's uses of Sophus (`Sophus::SE3d::exp/log` in
`core/Registration.cpp`, `core/Deskew.cpp:40-68`, `core/Threshold.cpp:29-50`) and the
scattered numpy helpers (`vfm_reg/utils.py:47-54` transform_pcl; the Newton-iteration
rotation orthogonalization at `registration_node.py:333-335`).

Tangent-vector convention matches Sophus: ``dx = [upsilon (translation), omega
(rotation)]`` so ``exp_se3(dx)`` agrees with ``Sophus::SE3d::exp(dx)``.

All functions are jit/vmap-friendly and work in float32 by default; pass float64
arrays for double precision (e.g. in CPU-side tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix such that hat(w) @ v == cross(w, v). Shape (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula with a Taylor-safe small-angle branch. (..., 3) -> (..., 3, 3).

    AD-safe at w == 0: sqrt is never differentiated at 0 (theta2 is replaced by
    1 inside the unselected branch before the sqrt — "double where")."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = hat_so3(w)
    K2 = K @ K
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks near 0.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of exp_so3. (..., 3, 3) -> (..., 3).

    AD-safe at theta -> 0 (the arccos input is replaced inside the unselected
    branch — the "double where" pattern — so jacfwd/jacrev give finite
    derivatives, needed by the pose-graph GN solver)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # Threshold must be representable in f32 (1 - 1e-8 rounds to 1.0!).
    small = cos_theta > 1.0 - 1e-6  # theta < ~1.4e-3
    near_pi_cos = cos_theta < -1.0 + 1e-6
    safe_cos = jnp.where(small | near_pi_cos, 0.0, cos_theta)
    theta_acos = jnp.arccos(safe_cos)
    # Small-angle theta from the vee part: |w_vee| = 2 sin(theta) ~ 2 theta.
    # Safe norm: d/dw sqrt(sum w^2) is NaN at w == 0 without the epsilon
    # (which must not underflow in float32 — 1e-20 stays representable).
    theta_small = 0.5 * jnp.sqrt(jnp.sum(w_vee * w_vee, axis=-1) + 1e-20)
    theta_pi = jnp.pi - jnp.sqrt(jnp.maximum(2.0 * (1.0 + cos_theta), 0.0))
    theta = jnp.where(small, theta_small, jnp.where(near_pi_cos, theta_pi, theta_acos))
    # theta / (2 sin(theta)), series: 1/2 + theta^2/12 near 0
    sin_theta = jnp.where(small | near_pi_cos, 1.0, jnp.sin(theta_acos))
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * sin_theta),
    )
    w = factor[..., None] * w_vee
    # Near theta == pi the vee formula degenerates; handle via the symmetric
    # part. The rewrite must COVER the near_pi_cos zone (theta > pi - 1.42e-3,
    # where sin_theta was neutralized to 1.0 and `w` above is garbage): a
    # narrower threshold leaves a dead band returning |w| ~ theta/2 * 2sin(d)
    # ~ 0.004 instead of ~pi. The wider 1e-2 margin also avoids the
    # factor = theta/(2 sin) amplification of f32 acos error (cot(theta) ~
    # -1/(pi - theta) blows a ~1e-5 theta error into ~1% of |w| at pi - 5e-3);
    # the axis-from-symmetric-part route carries only the theta error itself.
    near_pi = theta > jnp.pi - 1e-2
    # R + I has columns proportional to axis outer products.
    B = R + jnp.eye(3, dtype=R.dtype)
    col_norms = jnp.linalg.norm(B, axis=-2)
    best = jnp.argmax(col_norms, axis=-1)
    axis = jnp.take_along_axis(B, best[..., None, None], axis=-1)[..., 0]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    # Fix sign using the vee part (which is ~ 2 sin(theta) * axis, tiny but directional)
    sign = jnp.where(jnp.sum(axis * w_vee, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign
    return jnp.where(near_pi[..., None], w_pi, w)


def _left_jacobian_so3(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V used by the SE(3) exponential. AD-safe at w == 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = hat_so3(w)
    K2 = K @ K
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2_safe * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * K2


def _left_jacobian_inv_so3(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = hat_so3(w)
    K2 = K @ K
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.sin(half_theta)) / theta2_safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye - 0.5 * K + cot_term[..., None, None] * K2


def exp_se3(dx: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map. dx = [upsilon, omega] (..., 6) -> (..., 4, 4) homogeneous."""
    upsilon, omega = dx[..., :3], dx[..., 3:]
    R = exp_so3(omega)
    V = _left_jacobian_so3(omega)
    t = (V @ upsilon[..., None])[..., 0]
    T = jnp.zeros(dx.shape[:-1] + (4, 4), dtype=dx.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm. (..., 4, 4) -> (..., 6) with [upsilon, omega]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = log_so3(R)
    V_inv = _left_jacobian_inv_so3(omega)
    upsilon = (V_inv @ t[..., None])[..., 0]
    return jnp.concatenate([upsilon, omega], axis=-1)


def inverse_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form rigid-transform inverse (no general 4x4 inversion)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    T_inv = jnp.zeros_like(T)
    T_inv = T_inv.at[..., :3, :3].set(Rt)
    T_inv = T_inv.at[..., :3, 3].set(-(Rt @ t[..., None])[..., 0])
    T_inv = T_inv.at[..., 3, 3].set(1.0)
    return T_inv


def transform_points(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a homogeneous 4x4 transform to (..., N, 3) points.

    Behavioral clone of `vfm_reg/utils.py:47-54` (transform_pcl) — but descriptors
    are carried separately in this framework, so only xyz is passed in.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    # Full f32 matmul: TPU's default bf16 passes cost up to ~0.5 m at 100 m
    # coordinates (see utils.precision) — fatal for the 0.6 m recall gate.
    moved = jnp.matmul(
        points, jnp.swapaxes(R, -1, -2), precision=jax.lax.Precision.HIGHEST
    )
    return moved + t[..., None, :]


def orthogonalize_rotation(R: jnp.ndarray, num_iters: int = 10) -> jnp.ndarray:
    """Newton-iteration re-orthogonalization: R <- 3/2 R - 1/2 R R^T R.

    Fixed-iteration-count version of the `while |1 - det| > 1e-12` loop at
    `registration_node.py:333-335` (converges quadratically; 10 iterations reach
    f32 machine precision from any near-rotation).
    """

    def body(_, R):
        return 1.5 * R - 0.5 * (R @ jnp.swapaxes(R, -1, -2) @ R)

    return jax.lax.fori_loop(0, num_iters, body, R)


def rotation_geodesic_error_deg(R: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation error in degrees (`registration_node.py:1002-1006`)."""
    cos = jnp.clip(
        (jnp.trace(jnp.swapaxes(R, -1, -2) @ R_gt, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0
    )
    return jnp.rad2deg(jnp.abs(jnp.arccos(cos)))
