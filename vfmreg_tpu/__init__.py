"""vfmreg_tpu — TPU-native rebuild of "LiDAR Registration with Visual Foundation Models".

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
CUDA/C++/torch implementation (vniclas/VFM-Registration): DINOv2 point descriptors,
voxel-hash correspondence search, VFM/geometric ICP, RANSAC/TEASER-style/PointDSC
robust estimators, baseline point descriptors, scene preparation and the full
evaluation harness — re-designed TPU-first (static shapes, masked padding, MXU-shaped
matmuls, `lax` control flow, `shard_map` data parallelism over device meshes).

Reference layer map: see SURVEY.md and the per-module docstrings, which cite the
reference files whose behavior they reproduce.
"""

__version__ = "0.1.0"

from vfmreg_tpu.config import VFMRegConfig, KISSConfig, load_config  # noqa: F401
