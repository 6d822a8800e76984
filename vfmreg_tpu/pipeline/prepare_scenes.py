"""Scene preparation — clone of `prepare_scenes.py` (offline descriptor pass).

Per map/registration point cloud: voxel-downsample (0.2 m / 0.1 m), extract
DINOv2 features for each surround camera, project the cloud into each camera,
attach per-point descriptors (first camera wins on duplicates, zero vector for
uncovered points), and write the reference-layout HDF5.

TPU-first difference: per-pixel feature maps are never materialized — the ViT
patch grid is sampled directly at the projected pixels
(`ops/projection.sample_patch_features`), replacing the reference's
full-resolution `F.interpolate` + per-point Python-loop gather
(`prepare_scenes.py:85-91`).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Optional

import numpy as np

from vfmreg_tpu.data.h5io import save_scene
from vfmreg_tpu.kiss.voxelization import voxel_down_sample
from vfmreg_tpu.models.image_features import ImageFeatureGenerator
from vfmreg_tpu.ops.projection import sample_patch_features


def create_descriptors(image_files, sequence, feature_generator, pcl) -> np.ndarray:
    """Per-point descriptors from all cameras (`prepare_scenes.py:50-107`).

    `pcl` is [N, 3]; returns [N, D] float32 with zeros for uncovered points.
    """
    import jax.numpy as jnp

    from vfmreg_tpu.data.nclt import NCLT

    images = sequence.read_images(filenames=image_files)
    is_nclt = isinstance(sequence, NCLT)

    pcl_h = np.insert(pcl, 3, values=1, axis=1).T  # 4xN homogeneous (`:69`)

    pcl_indices: Optional[np.ndarray] = None
    pcl_features: Optional[np.ndarray] = None
    n_features = feature_generator.feature_size

    for camera, image in images.items():
        # Patch-grid features of the stored image orientation.
        patch_feats = feature_generator.get_image_features(image, upsample=False)

        if is_nclt:
            # Projection happens in the un-rotated frame: rotate the image back
            # CCW and the patch grid with it (`prepare_scenes.py:72-93`).
            import cv2

            image_proj = cv2.rotate(image, cv2.ROTATE_90_COUNTERCLOCKWISE)
            patch_feats = np.rot90(patch_feats, k=1, axes=(0, 1)).copy()
        else:
            image_proj = image

        u, v, pcl_indices_ = sequence.project_pcl_to_image(pcl_h, image_proj, camera)
        if len(pcl_indices_) == 0:
            continue

        feats = np.array(
            sample_patch_features(
                jnp.asarray(patch_feats),
                jnp.asarray(u),
                jnp.asarray(v),
                image_proj.shape[0],
                image_proj.shape[1],
            )
        )
        # Zero features where the image pixel is empty (`prepare_scenes.py:57-62`).
        empty_px = np.all(image_proj[v, u] == 0, axis=-1)
        feats[empty_px] = 0.0

        if pcl_indices is None:
            pcl_indices = pcl_indices_
            pcl_features = feats
        else:
            pcl_indices = np.r_[pcl_indices, pcl_indices_]
            pcl_features = np.r_[pcl_features, feats]

    pcl_descriptors = np.zeros((pcl.shape[0], n_features), dtype=np.float32)
    if pcl_indices is None:
        return pcl_descriptors

    # Dedupe multi-camera hits: first occurrence wins (`prepare_scenes.py:96-101`).
    unique_indices, unique_idx = np.unique(pcl_indices, return_index=True)
    pcl_descriptors[pcl_indices[unique_idx]] = pcl_features[unique_idx].astype(np.float32)
    return pcl_descriptors


def prepare_scene(dataset_dir: Path, scene_file: Path, output_dir: Path, feature_generator=None):
    """`main` (`prepare_scenes.py:110-171`)."""
    from vfmreg_tpu.data.nclt import NCLT
    from vfmreg_tpu.data.oxford_robotcar import OxfordRobotcar

    dataset_dir = Path(dataset_dir)
    if "nclt" in dataset_dir.name:
        Dataset = NCLT
        date_idx = 1
    elif "robotcar" in dataset_dir.name:
        Dataset = OxfordRobotcar
        date_idx = 0
    else:
        raise ValueError("Unknown dataset")

    if feature_generator is None:
        feature_generator = ImageFeatureGenerator("dinov2", use_featup=False)

    with open(scene_file, "r") as f:
        scene_data = json.load(f)

    # The reference indexes the file LIST at date_idx (`prepare_scenes.py:131`),
    # assuming >= 2 mapping clouds; clamp so 1-cloud scenes also work.
    map_files = scene_data["mapping"]["point_clouds"]
    sequences = [map_files[min(date_idx, len(map_files) - 1)].split("/")[1]]
    for seq in scene_data["registration"]:
        sequences.append(seq["point_cloud"].split("/")[date_idx])

    map_sequence = Dataset(sequences[0], dataset_dir, high_level_api=True)
    map_point_clouds = []
    for i, pcl_file in enumerate(scene_data["mapping"]["point_clouds"]):
        pcl = map_sequence.read_pcl(filename=dataset_dir / pcl_file)
        pcl = voxel_down_sample(pcl, 0.2).astype(pcl.dtype)
        image_files = [dataset_dir / f for f in scene_data["mapping"]["images"][i]]
        descriptors = create_descriptors(image_files, map_sequence, feature_generator, pcl)
        map_point_clouds.append(np.c_[pcl, descriptors])
    map_poses = [np.array(p) for p in scene_data["mapping"]["poses"]]

    seq_point_clouds, seq_poses = [], []
    for i, registration in enumerate(scene_data["registration"]):
        reg_sequence = Dataset(sequences[i + 1], dataset_dir, high_level_api=True)
        pcl = reg_sequence.read_pcl(filename=dataset_dir / registration["point_cloud"])
        pcl = voxel_down_sample(pcl, 0.1).astype(pcl.dtype)
        image_files = [dataset_dir / f for f in registration["images"]]
        descriptors = create_descriptors(image_files, reg_sequence, feature_generator, pcl)
        seq_point_clouds.append(np.c_[pcl, descriptors])
        seq_poses.append(np.array(registration["pose"]))

    output_filename = Path(output_dir) / Path(scene_file).name.replace(".json", ".h5")
    save_scene(output_filename, sequences, map_poses, map_point_clouds, seq_poses, seq_point_clouds)
    return output_filename


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_folder", type=str)
    parser.add_argument("scene_folder", type=str)
    parser.add_argument("--output_folder", type=str, required=False, default=None)
    args = parser.parse_args()

    dataset_dir = Path(args.dataset_folder)
    scene_dir = Path(args.scene_folder)
    if args.output_folder is not None:
        output_dir = Path(args.output_folder)
    elif args.scene_folder.endswith(".json"):
        output_dir = scene_dir.parent / "processed_scenes"
    else:
        output_dir = scene_dir / "processed_scenes"

    scene_files = [scene_dir] if args.scene_folder.endswith(".json") else sorted(
        scene_dir.glob("*.json")
    )
    print(f"Found {len(scene_files)} scene file(s).")
    for scene_file in scene_files:
        prepare_scene(dataset_dir, scene_file, output_dir)


if __name__ == "__main__":
    main()
