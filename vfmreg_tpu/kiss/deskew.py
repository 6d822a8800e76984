"""Constant-velocity motion compensation (`core/Deskew.cpp:40-68` +
`kiss_icp/deskew.py`): per-point pose exp((t_i - 0.5) * log(T_start^-1 T_finish)),
descriptor columns preserved."""

from __future__ import annotations

import numpy as np

from vfmreg_tpu.config import KISSConfig

MID_POSE_TIMESTAMP = 0.5


def get_motion_compensator(config: KISSConfig):
    return MotionCompensator() if config.data.deskew else StubCompensator()


class StubCompensator:
    def deskew_scan(self, frame, poses, timestamps):
        return frame


class MotionCompensator:
    def deskew_scan(self, frame: np.ndarray, poses, timestamps) -> np.ndarray:
        if len(poses) <= 2:
            return frame
        import jax.numpy as jnp

        from vfmreg_tpu.geometry.se3 import exp_se3, log_se3

        start_pose = np.asarray(poses[-2], dtype=np.float64)
        finish_pose = np.asarray(poses[-1], dtype=np.float64)
        delta = np.asarray(log_se3(jnp.asarray(np.linalg.inv(start_pose) @ finish_pose)))
        ts = np.asarray(timestamps, dtype=np.float64).reshape(-1, 1)
        motions = np.asarray(exp_se3(jnp.asarray((ts - MID_POSE_TIMESTAMP) * delta)))
        xyz = frame[:, :3]
        out = np.einsum("nij,nj->ni", motions[:, :3, :3], xyz) + motions[:, :3, 3]
        if frame.shape[1] > 3:
            return np.c_[out.astype(frame.dtype), frame[:, 3:]]
        return out.astype(frame.dtype)
