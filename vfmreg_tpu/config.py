"""One typed configuration tree for the whole framework.

Replaces the reference's four config mechanisms (pydantic KISSConfig at
`src/kiss-icp/python/kiss_icp/config/config.py:28-43`, argparse CLIs, ROS params,
and the compile-time constant `DESCRIPTOR_SIZE = 384` at
`src/kiss-icp/cpp/kiss_icp/core/DescriptorSize.hpp:7`). The descriptor dimension is
a runtime parameter here (384 for ViT-S/14, 512 MaskCLIP, 768 ViT-B, 1024 ViT-L).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional


@dataclasses.dataclass
class DataConfig:
    """Mirrors kiss_icp DataConfig (`config/config.py:28-32`)."""

    preprocess: bool = True
    max_range: float = 100.0
    min_range: float = 5.0
    deskew: bool = False


@dataclasses.dataclass
class MappingConfig:
    """Mirrors kiss_icp MappingConfig (`config/config.py:35-37`)."""

    voxel_size: Optional[float] = None  # default: max_range / 100
    max_points_per_voxel: int = 20
    # Device-resident odometry: merge buffered frames into the device map every
    # K-th update (1 = exact per-update reference semantics; the newest <=K-1
    # frames are invisible to NN between merges). See kiss/mapping.py.
    map_merge_interval: int = 1


@dataclasses.dataclass
class AdaptiveThresholdConfig:
    """Mirrors kiss_icp AdaptiveThresholdConfig (`config/config.py:40-43`)."""

    fixed_threshold: Optional[float] = None
    initial_threshold: float = 2.0
    min_motion_th: float = 0.1


@dataclasses.dataclass
class RegistrationConfig:
    """ICP / VFM-ICP budgets (reference: `core/Registration.cpp:92-94,215`)."""

    max_num_iterations: int = 1000
    estimation_threshold: float = 1e-4
    eucl_dist_threshold: float = 0.01  # VFM-ICP mean-distance convergence
    min_cosine_similarity: float = 0.8
    mad_multiplier: float = 1.5  # |d - median| < mad_multiplier * MAD (`:320`)
    vfm_source_voxel_size: float = 5.0  # `Registration.cpp:217`
    vfm_min_source_points: int = 100  # `Registration.cpp:218`


@dataclasses.dataclass
class RansacConfig:
    """RANSAC-on-correspondences budget (`registration_node.py:319-327`)."""

    ransac_n: int = 3
    max_iterations: int = 50000
    max_correspondence_distance: float = 0.75  # inlier radius = 3*voxel? o3d default
    snap_tolerance: float = 1e-3  # correspondence-to-voxel-cloud snap (`:301`)


@dataclasses.dataclass
class VFMConfig:
    """Foundation-model feature extraction (`vfm_reg/image_features.py:23-77`)."""

    foundation_model: str = "dinov2"  # or "maskclip"
    use_featup: bool = False  # main pipeline uses raw backbone + bilinear
    patch_size: int = 14
    patch_h: int = 16
    feature_size: int = 384


@dataclasses.dataclass
class KISSConfig:
    """The odometry-side config (`config/parser.py:39-83`)."""

    out_dir: str = "results"
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mapping: MappingConfig = dataclasses.field(default_factory=MappingConfig)
    adaptive_threshold: AdaptiveThresholdConfig = dataclasses.field(
        default_factory=AdaptiveThresholdConfig
    )


@dataclasses.dataclass
class VFMRegConfig:
    """Top-level config for the registration benchmark harness."""

    kiss: KISSConfig = dataclasses.field(default_factory=KISSConfig)
    registration: RegistrationConfig = dataclasses.field(default_factory=RegistrationConfig)
    ransac: RansacConfig = dataclasses.field(default_factory=RansacConfig)
    vfm: VFMConfig = dataclasses.field(default_factory=VFMConfig)
    descriptor_dim: int = 384
    # Padding buckets (powers of two) used to quantize dynamic point counts into
    # a small set of static compiled shapes.
    shape_bucket_base: int = 512


def load_config(
    config_file: Optional[Path] = None,
    deskew: Optional[bool] = None,
    max_range: Optional[float] = None,
) -> KISSConfig:
    """Behavioral clone of kiss_icp `load_config` (`config/parser.py:61-83`).

    Loads optional YAML overrides, applies CLI-style deskew/max_range overrides,
    fixes min_range > max_range, and derives voxel_size = max_range / 100.
    """
    config = KISSConfig()
    if config_file is not None:
        import yaml

        with open(config_file) as f:
            data = yaml.safe_load(f) or {}
        for section_name in ("data", "mapping", "adaptive_threshold"):
            section = data.get(section_name) or {}
            target = getattr(config, section_name)
            for k, v in section.items():
                if hasattr(target, k):
                    setattr(target, k, v)
        if "out_dir" in data:
            config.out_dir = data["out_dir"]

    if deskew is not None:
        config.data.deskew = deskew
    if max_range is not None:
        config.data.max_range = max_range

    if config.data.max_range < config.data.min_range:
        print("[WARNING] max_range is smaller than min_range, setting min_range to 0.0")
        config.data.min_range = 0.0

    if config.mapping.voxel_size is None:
        config.mapping.voxel_size = float(config.data.max_range / 100.0)

    return config


def write_config(config: KISSConfig, filename: str) -> None:
    """Dump a KISSConfig to YAML (`config/parser.py:86-93`)."""
    import yaml

    with open(filename, "w") as f:
        yaml.dump(dataclasses.asdict(config), f, default_flow_style=False)
