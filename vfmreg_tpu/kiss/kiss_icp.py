"""The KissICP odometry class — behavioral clone of `kiss_icp/kiss_icp.py:36-122`.

Per frame: (deskew) -> range crop -> double voxelization (0.5 v for the map,
1.5 v for the registration source) -> adaptive sigma -> constant-velocity initial
guess -> `register_frame` -> map update gated by `map_update_threshold`.
Descriptor clouds use the reference's index-carrying trick: crop/voxelize on
xyz+index, then regather descriptor columns (`kiss_icp.py:54-76`).
"""

from __future__ import annotations

import numpy as np

from vfmreg_tpu.config import KISSConfig
from vfmreg_tpu.kiss.deskew import get_motion_compensator
from vfmreg_tpu.kiss.mapping import get_voxel_hash_map
from vfmreg_tpu.kiss.preprocess import get_preprocessor
from vfmreg_tpu.kiss.registration import register_frame
from vfmreg_tpu.kiss.threshold import get_threshold_estimator
from vfmreg_tpu.kiss.voxelization import voxel_down_sample


class KissICP:
    def __init__(self, config: KISSConfig, map_update_threshold: float = 0.0):
        self.poses = []
        self.config = config
        self.compensator = get_motion_compensator(config)
        self.adaptive_threshold = get_threshold_estimator(config)
        self.local_map = get_voxel_hash_map(config)
        self.preprocess = get_preprocessor(config)
        self.map_update_threshold = map_update_threshold

    def register_frame(self, frame: np.ndarray, timestamps, use_descriptors: bool = False):
        frame = np.asarray(frame)

        # Preprocess (index-carrying for descriptor clouds, `kiss_icp.py:54-60`)
        if frame.shape[1] == 3:
            frame = self.preprocess(frame)
        else:
            frame_xyzi = np.c_[frame[:, :3], np.arange(frame.shape[0], dtype=frame.dtype)]
            frame_xyzi = self.preprocess(frame_xyzi)
            frame = np.c_[frame_xyzi[:, :3], frame[frame_xyzi[:, 3].astype(int), 3:]]

        # Voxelize (`kiss_icp.py:62-76`)
        if frame.shape[1] == 3:
            source, frame_downsample = self.voxelize(frame)
        else:
            frame_xyzi = np.c_[frame[:, :3], np.arange(frame.shape[0], dtype=frame.dtype)]
            source_xyzi, down_xyzi = self.voxelize(frame_xyzi)
            source = np.c_[source_xyzi[:, :3], frame[source_xyzi[:, 3].astype(int), 3:]]
            frame_downsample = np.c_[down_xyzi[:, :3], frame[down_xyzi[:, 3].astype(int), 3:]]
        if not use_descriptors:
            source = source[:, :3]
            original_frame_downsample = frame_downsample.copy()
            frame_downsample = frame_downsample[:, :3]
        else:
            original_frame_downsample = frame_downsample

        sigma = self.get_adaptive_threshold()
        prediction = self.get_prediction_model()
        last_pose = self.poses[-1] if self.poses else np.eye(4)
        initial_guess = last_pose @ prediction

        new_pose = register_frame(
            points=source,
            voxel_map=self.local_map,
            initial_guess=initial_guess,
            max_correspondance_distance=3 * sigma,
            kernel=sigma / 3,
            # Odometry registers through the XD overload like the reference's
            # C++ server (v2 keeps descriptors -> cosine-weighted champion NN;
            # `OdometryServer.cpp:87-95`); it never runs VFM-ICP.
            force_xd=use_descriptors,
        )

        # Map update gated by motion (`kiss_icp.py:104-111`)
        motion = np.linalg.inv(last_pose) @ new_pose
        if np.linalg.norm(motion[:3, -1]) < self.map_update_threshold and len(self.poses) > 1:
            return new_pose, original_frame_downsample, False

        self.adaptive_threshold.update_model_deviation(np.linalg.inv(initial_guess) @ new_pose)
        self.local_map.update(frame_downsample, new_pose)
        self.poses.append(new_pose)
        return new_pose, original_frame_downsample, True

    def voxelize(self, iframe: np.ndarray):
        """Double downsample: 0.5 v map cloud, 1.5 v source (`kiss_icp.py:114-120`)."""
        frame_downsample = voxel_down_sample(iframe, self.config.mapping.voxel_size * 0.5)
        source = voxel_down_sample(frame_downsample, self.config.mapping.voxel_size * 1.5)
        return source, frame_downsample

    def get_adaptive_threshold(self) -> float:
        return (
            self.config.adaptive_threshold.initial_threshold
            if not self.has_moved()
            else self.adaptive_threshold.get_threshold()
        )

    def get_prediction_model(self) -> np.ndarray:
        if len(self.poses) < 2:
            return np.eye(4)
        return np.linalg.inv(self.poses[-2]) @ self.poses[-1]

    def has_moved(self) -> bool:
        if len(self.poses) < 1:
            return False
        motion = np.linalg.inv(self.poses[0]) @ self.poses[-1]
        return float(np.linalg.norm(motion[:3, 3])) > 5 * self.config.adaptive_threshold.min_motion_th
