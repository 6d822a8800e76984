from vfmreg_tpu.ops.voxel import (  # noqa: F401
    voxel_coords,
    voxel_hash,
    voxel_down_sample_masked,
    range_crop_masked,
    compact_by_mask,
)
from vfmreg_tpu.ops.hash_grid import HashGrid, build_hash_grid, nearest_neighbors  # noqa: F401
