"""Registration / trajectory metrics.

* RRE / RTE + success-rate tables: `registration_node.py:997-1025` and
  `print_errors.py:16-81`.
* KITTI relative sequence error over 100-800 m segments + Umeyama-aligned ATE:
  `src/kiss-icp/cpp/kiss_icp/metrics/Metrics.cpp:90-191`.

These are offline evaluation utilities; they run in numpy on the host (they touch
ragged trajectory lists, not the hot path).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def rotation_error_deg(pose: np.ndarray, gt_pose: np.ndarray) -> float:
    """Geodesic rotation error in degrees (`registration_node.py:1002-1006`)."""
    R = pose[:3, :3]
    R_gt = gt_pose[:3, :3]
    cos = min(max(((R.T @ R_gt).trace() - 1.0) / 2.0, -1.0), 1.0)
    return float(np.rad2deg(abs(np.arccos(cos))))


def translation_error(pose: np.ndarray, gt_pose: np.ndarray) -> float:
    """L2 translation error in meters (`registration_node.py:1008-1011`)."""
    return float(np.linalg.norm(pose[:3, 3] - gt_pose[:3, 3]))


def compute_errors(pose: np.ndarray, gt_pose: np.ndarray) -> Tuple[float, float]:
    """(RTE, RRE) — argument order as in `compute_errors` (`registration_node.py:997`)."""
    return translation_error(pose, gt_pose), rotation_error_deg(pose, gt_pose)


def success_rate(
    trans_errors: Sequence[float],
    rot_errors: Sequence[float],
    translation_threshold: float,
    rotation_threshold: float,
) -> float:
    """Fraction with RTE < t_thr AND RRE < r_thr (`registration_node.py:1021-1025`)."""
    t = np.asarray(trans_errors) < translation_threshold
    r = np.asarray(rot_errors) < rotation_threshold
    if t.size == 0:
        return float("nan")
    return float(np.mean(t & r))


# Thresholds reported by the harness (`registration_node.py:973-977`).
SUCCESS_THRESHOLDS = [(0.3, 15.0), (0.6, 1.5), (2.0, 5.0)]

_SEGMENT_LENGTHS = [100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0]


def _trajectory_distances(poses: Sequence[np.ndarray]) -> np.ndarray:
    dist = [0.0]
    for i in range(1, len(poses)):
        dist.append(dist[-1] + float(np.linalg.norm(poses[i][:3, 3] - poses[i - 1][:3, 3])))
    return np.asarray(dist)


def _last_frame_from_segment_length(dist: np.ndarray, first: int, length: float) -> int:
    for i in range(first, len(dist)):
        if dist[i] > dist[first] + length:
            return i
    return -1


def seq_error(
    poses_gt: Sequence[np.ndarray], poses_result: Sequence[np.ndarray]
) -> Tuple[float, float]:
    """KITTI average relative (trans %, rot deg/m) error (`Metrics.cpp:90-155`).

    Note the reference divides rotation by 3.14 (sic), not pi — reproduced here.
    """
    step_size = 10
    dist = _trajectory_distances(poses_gt)
    t_errs: List[float] = []
    r_errs: List[float] = []
    for first in range(0, len(poses_gt), step_size):
        for length in _SEGMENT_LENGTHS:
            last = _last_frame_from_segment_length(dist, first, length)
            if last == -1:
                continue
            delta_gt = np.linalg.inv(poses_gt[first]) @ poses_gt[last]
            delta_res = np.linalg.inv(poses_result[first]) @ poses_result[last]
            err = np.linalg.inv(delta_res) @ delta_gt
            d = 0.5 * (np.trace(err[:3, :3]) - 1.0)
            r_err = np.arccos(max(min(d, 1.0), -1.0))
            t_err = float(np.linalg.norm(err[:3, 3]))
            t_errs.append(t_err / length)
            r_errs.append(r_err / length)
    if not t_errs:
        return float("nan"), float("nan")
    avg_t = 100.0 * float(np.mean(t_errs))
    avg_r = float(np.mean(r_errs)) / 3.14 * 180.0
    return avg_t, avg_r


def umeyama_alignment(source: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Rigid (no-scale) Umeyama alignment of 3xN point sets -> 4x4."""
    mu_s = source.mean(axis=1, keepdims=True)
    mu_t = target.mean(axis=1, keepdims=True)
    cov = (target - mu_t) @ (source - mu_s).T / source.shape[1]
    U, _, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = (mu_t - R @ mu_s)[:, 0]
    return T


def absolute_trajectory_error(
    poses_gt: Sequence[np.ndarray], poses_result: Sequence[np.ndarray]
) -> Tuple[float, float]:
    """(ATE_rot [rad], ATE_trans [m]) RMSE after Umeyama alignment
    (`Metrics.cpp:157-191`).

    Caveat shared with the reference: the alignment uses POSITIONS only, so on
    a (near-)collinear trajectory the position covariance is rank-1 and the
    Umeyama rotation about the line axis is noise-determined — ATE_rot can
    read large (radians) even for near-perfect poses. `Eigen::umeyama`
    degenerates identically; judge ATE_rot only on trajectories with 3-D
    structure."""
    assert len(poses_gt) == len(poses_result)
    src = np.stack([p[:3, 3] for p in poses_result], axis=1)
    tgt = np.stack([p[:3, 3] for p in poses_gt], axis=1)
    T_align = umeyama_alignment(src, tgt)
    ate_rot = 0.0
    ate_trans = 0.0
    for gt, res in zip(poses_gt, poses_result):
        est = T_align @ res
        delta_R = gt[:3, :3] @ est[:3, :3].T
        delta_t = gt[:3, 3] - delta_R @ est[:3, 3]
        cos = max(min((np.trace(delta_R) - 1.0) / 2.0, 1.0), -1.0)
        theta = np.arccos(cos)
        ate_rot += theta * theta
        ate_trans += float(delta_t @ delta_t)
    n = len(poses_gt)
    return float(np.sqrt(ate_rot / n)), float(np.sqrt(ate_trans / n))
