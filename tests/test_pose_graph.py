import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.registration.pose_graph import PoseGraphOptimizer


def _se3(t, yaw_deg=0.0):
    T = np.eye(4)
    T[:3, :3] = R.from_euler("z", yaw_deg, degrees=True).as_matrix()
    T[:3, 3] = t
    return T


@pytest.mark.slow
def test_pose_graph_odometry_chain_with_loop(rng):
    """Square loop with drifting odometry: the loop closure pulls the last
    pose back to the origin."""
    gt = [
        _se3([0, 0, 0], 0),
        _se3([10, 0, 0], 90),
        _se3([10, 10, 0], 180),
        _se3([0, 10, 0], 270),
        _se3([0, 0, 0], 0),
    ]
    opt = PoseGraphOptimizer()
    # Drifting initial estimates.
    drift = np.eye(4)
    for k, T in enumerate(gt):
        est = T.copy()
        est[:3, 3] += rng.normal(0, 0.3, 3) if k > 0 else 0.0
        opt.add_pose(est)
    opt.add_prior(0, gt[0])
    for k in range(4):
        rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        noisy = rel.copy()
        noisy[:3, 3] += rng.normal(0, 0.05, 3)
        opt.add_odometry(k, k + 1, noisy)
    # Loop closure: pose 4 == pose 0
    opt.add_loop_closure(0, 4, np.eye(4))

    poses = opt.optimize(num_iters=15)
    # First pose pinned by prior; last pose pulled to the origin
    assert np.linalg.norm(poses[0][:3, 3]) < 1e-3
    assert np.linalg.norm(poses[4][:3, 3]) < 0.15


@pytest.mark.slow
def test_pose_graph_consistency(rng):
    """With perfect measurements the solution matches ground truth."""
    gt = [_se3([i * 2.0, 0, 0], 10 * i) for i in range(6)]
    opt = PoseGraphOptimizer()
    for T in gt:
        noisy = T.copy()
        noisy[:3, 3] += rng.normal(0, 0.5, 3)
        opt.add_pose(noisy)
    opt.add_prior(0, gt[0])
    for k in range(5):
        opt.add_odometry(k, k + 1, np.linalg.inv(gt[k]) @ gt[k + 1])
    poses = opt.optimize(num_iters=15)
    for T, G in zip(poses, gt):
        assert np.linalg.norm(T[:3, 3] - G[:3, 3]) < 1e-2


def test_nn_distance(rng):
    import jax.numpy as jnp

    from vfmreg_tpu.ops.nndistance import chamfer_loss, nn_distance

    a = rng.uniform(-1, 1, (2, 50, 3)).astype(np.float32)
    b = a + 0.01  #近 identical clouds
    d1, i1, d2, i2 = nn_distance(jnp.asarray(a), jnp.asarray(b))
    assert float(jnp.max(d1)) < 0.001
    np.testing.assert_array_equal(np.asarray(i1)[0], np.arange(50))
    # Gradients flow
    import jax

    g = jax.grad(lambda x: chamfer_loss(x, jnp.asarray(b)))(jnp.asarray(a))
    assert np.all(np.isfinite(np.asarray(g)))
