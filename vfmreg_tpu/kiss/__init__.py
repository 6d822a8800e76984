"""kiss — the KISS-ICP-compatible odometry layer of vfmreg_tpu.

Mirrors the public Python surface of the reference fork
(`src/kiss-icp/python/kiss_icp/`): `voxel_down_sample`, `get_voxel_hash_map` /
`VoxelHashMap`, `register_frame`, `AdaptiveThreshold`, `KissICP`,
`OdometryPipeline` — host-facing numpy APIs backed by the device kernels (and the
native C++ hash map when built).
"""

from vfmreg_tpu.kiss.voxelization import voxel_down_sample  # noqa: F401
from vfmreg_tpu.kiss.mapping import VoxelHashMap, get_voxel_hash_map  # noqa: F401
from vfmreg_tpu.kiss.registration import register_frame  # noqa: F401
from vfmreg_tpu.kiss.threshold import AdaptiveThreshold, get_threshold_estimator  # noqa: F401
from vfmreg_tpu.kiss.kiss_icp import KissICP  # noqa: F401
