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


@pytest.mark.slow
def test_incremental_pose_graph_matches_reference_behavior(rng):
    """IncrementalPoseGraph mirrors `PoseGraphOptimizationGtsam`
    (`pose_graph_optimization.py:10-115`): chained odometry initial estimates,
    optimize-on-first-loop policy, warm-started active-window updates that
    converge to the batch solution."""
    from vfmreg_tpu.registration.pose_graph import (
        IncrementalPoseGraph,
        PoseGraphOptimizer,
    )

    # Square trajectory traversed twice, loop closure at each corner revisit.
    n_side = 4
    gt = [_se3([0, 0, 0], 0)]
    for lap in range(2):
        for k, (t, yaw) in enumerate(
            [([10, 0, 0], 90), ([10, 10, 0], 180), ([0, 10, 0], 270), ([0, 0, 0], 0)]
        ):
            gt.append(_se3(t, yaw))

    inc = IncrementalPoseGraph(min_factors=100)  # only loops trigger here
    inc.add_prior_factor_pose(0, gt[0])
    assert inc.size() == 1 and np.allclose(inc.pose_at(-1), gt[0])

    batch = PoseGraphOptimizer()
    batch.add_pose(gt[0])
    batch.add_prior(0, gt[0])

    optimized_events = 0
    for k in range(1, len(gt)):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noisy = rel.copy()
        noisy[:3, 3] += rng.normal(0, 0.05, 3)
        inc.add_odom_edge(k, noisy, sigma=0.01)
        # chained initial estimate: prev_estimate @ measurement (`:100-108`)
        np.testing.assert_allclose(
            inc.pose_at(k), inc.pose_at(k - 1) @ noisy, atol=1e-9
        )
        batch.add_pose(inc.pose_at(k))
        batch.add_odometry(k - 1, k, noisy, sigmas=np.full(6, 0.01))
        if k <= 5:
            assert inc.optimize_if_needed() is False  # no loop yet, below min_factors
        else:
            # Reference quirk (`optimize_if_needed`, `:59-72`): the loop branch
            # never resets new_loops_count, so once exactly one loop has been
            # added every call keeps re-optimizing until a batch optimization
            # resets it.
            assert inc.optimize_if_needed() is True

        if k == 5:  # first corner revisit: pose 5 observes pose 1's corner
            inc.add_loop_edge(1, 5, np.eye(4), sigma=0.05)
            batch.add_loop_closure(1, 5, np.eye(4), sigmas=np.full(6, 0.05))
            assert inc.optimize_if_needed() is True  # optimize-on-loop
            optimized_events += 1
        if k == 8:  # closes back at the origin corner
            inc.add_loop_edge(0, 8, np.eye(4), sigma=0.05)
            batch.add_loop_closure(0, 8, np.eye(4), sigmas=np.full(6, 0.05))
            # new_loops_count is now 2: neither reference branch fires
            # (loop branch wants EXACTLY one; min_factors not reached).
            assert inc.optimize_if_needed() is False
            optimized_events += 1
    assert optimized_events == 2

    batch_poses = batch.optimize(num_iters=25)
    inc.optimize(num_iters=25)
    for k in range(len(gt)):
        # incremental (active-window, warm-started) agrees with full batch
        d = np.linalg.norm(inc.pose_at(k)[:3, 3] - batch_poses[k][:3, 3])
        assert d < 0.05, (k, d)
        # and both are close to ground truth after the loop closures
        assert np.linalg.norm(inc.pose_at(k)[:3, 3] - gt[k][:3, 3]) < 0.3, k


@pytest.mark.slow
def test_incremental_active_window_freezes_upstream(rng):
    """A loop touching only the tail must not move long-settled upstream poses
    (the iSAM2-style bounded update)."""
    from vfmreg_tpu.registration.pose_graph import IncrementalPoseGraph

    inc = IncrementalPoseGraph(min_factors=1)
    inc.add_prior_factor_pose(0, _se3([0, 0, 0]))
    for k in range(1, 12):
        rel = _se3([1.0, 0, 0])
        rel[:3, 3] += rng.normal(0, 0.01, 3)
        inc.add_odom_edge(k, rel, sigma=0.01)
        inc.optimize_if_needed()
    frozen_before = [inc.pose_at(k).copy() for k in range(8)]

    # a loop between tail vertices 9 and 11 only
    rel = np.linalg.inv(inc.pose_at(9)) @ inc.pose_at(11)
    rel[:3, 3] += 0.2
    inc.add_loop_edge(9, 11, rel, sigma=0.05)
    assert inc.optimize_if_needed() is True
    for k in range(8):
        np.testing.assert_allclose(inc.pose_at(k), frozen_before[k], atol=1e-6)


def test_incremental_skips_solve_without_new_information(rng, monkeypatch):
    """After a loop closure the reference quirk keeps new_loops_count == 1, so
    optimize_if_needed() calls optimize() every frame — but with zero new
    factors the solution is already current and the dense GN solve must be
    skipped (gtsam's empty isam.update is near-free)."""
    from vfmreg_tpu.registration import pose_graph as pg

    g = pg.IncrementalPoseGraph(min_factors=100)
    g.add_prior_factor_pose(0, np.eye(4))
    T = np.eye(4)
    T[0, 3] = 1.0
    g.add_odom_edge(1, T)
    g.add_loop_edge(0, 1, np.eye(4), sigma=0.1)
    assert g.optimize_if_needed()  # first loop -> solves
    poses_after = [p.copy() for p in g.poses]

    calls = {"n": 0}
    orig = pg._optimize

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pg, "_optimize", counting)
    # new_loops_count stays 1 (reference behavior) -> optimize() re-enters,
    # but with nothing new it must not re-run the GN solve.
    assert g.optimize_if_needed()
    assert calls["n"] == 0
    for a, b in zip(g.poses, poses_after):
        np.testing.assert_array_equal(a, b)
