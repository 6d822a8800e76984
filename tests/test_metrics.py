import numpy as np
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.geometry import metrics


def test_rotation_error_deg():
    gt = np.eye(4)
    pose = np.eye(4)
    pose[:3, :3] = R.from_euler("z", 10, degrees=True).as_matrix()
    assert abs(metrics.rotation_error_deg(pose, gt) - 10.0) < 1e-6


def test_translation_error():
    gt = np.eye(4)
    pose = np.eye(4)
    pose[:3, 3] = [3.0, 4.0, 0.0]
    assert abs(metrics.translation_error(pose, gt) - 5.0) < 1e-9


def test_success_rate():
    te = [0.1, 0.5, 2.0]
    re = [1.0, 2.0, 0.5]
    # (0.6m, 1.5deg): only the first passes both
    assert abs(metrics.success_rate(te, re, 0.6, 1.5) - 1 / 3) < 1e-9


def _straight_trajectory(n, step=1.0, drift=0.0):
    gt, est = [], []
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = i * step
        gt.append(T.copy())
        T2 = T.copy()
        T2[1, 3] = drift * i * step
        est.append(T2)
    return gt, est


def test_seq_error_zero_for_perfect():
    gt, est = _straight_trajectory(2000, step=1.0, drift=0.0)
    t_err, r_err = metrics.seq_error(gt, est)
    assert t_err < 1e-9
    assert r_err < 1e-9


def test_seq_error_detects_drift():
    gt, est = _straight_trajectory(2000, step=1.0, drift=0.01)
    t_err, _ = metrics.seq_error(gt, est)
    assert 0.5 < t_err < 2.0  # ~1% drift


def test_ate_zero_after_alignment():
    # A rigidly offset trajectory has zero ATE after Umeyama alignment.
    gt, _ = _straight_trajectory(50)
    offset = np.eye(4)
    offset[:3, :3] = R.from_euler("z", 30, degrees=True).as_matrix()
    offset[:3, 3] = [5, -2, 1]
    est = [offset @ g for g in gt]
    ate_rot, ate_trans = metrics.absolute_trajectory_error(gt, est)
    assert ate_trans < 1e-6


def test_ate_detects_noise(rng):
    gt, _ = _straight_trajectory(50)
    est = []
    for g in gt:
        T = g.copy()
        T[:3, 3] += rng.normal(0, 0.5, 3)
        est.append(T)
    _, ate_trans = metrics.absolute_trajectory_error(gt, est)
    assert 0.2 < ate_trans < 1.0


def test_errors_with_nonidentity_gt():
    """Non-degenerate gt (rotation AND translation): an implementation that
    ignores gt_pose, or composes the relative pose in the wrong frame, cannot
    pass these."""
    gt = np.eye(4)
    gt[:3, :3] = R.from_euler("zyx", [30, -10, 5], degrees=True).as_matrix()
    gt[:3, 3] = [2.0, -7.0, 1.5]
    # pose = gt composed with a known extra rotation/translation
    extra_R = R.from_euler("y", 4.0, degrees=True).as_matrix()
    pose = gt.copy()
    pose[:3, :3] = gt[:3, :3] @ extra_R
    assert abs(metrics.rotation_error_deg(pose, gt) - 4.0) < 1e-6
    assert metrics.translation_error(pose, gt) < 1e-9

    pose2 = gt.copy()
    pose2[:3, 3] = gt[:3, 3] + np.array([1.0, 2.0, 2.0])
    assert abs(metrics.translation_error(pose2, gt) - 3.0) < 1e-9
    assert metrics.rotation_error_deg(pose2, gt) < 1e-6
