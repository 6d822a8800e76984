"""KISS-ICP odometry on a synthetic corridor sequence (CPU-runnable).

Drives `OdometryPipeline` — the reference `kiss_icp` pipeline surface — over a
fabricated straight-corridor drive (1 m/frame), with or without descriptor
columns (the reference odometry server's v0/v1 vs v2 modes):

    python examples/odometry_corridor.py                # xyz odometry (v0/v1)
    python examples/odometry_corridor.py --descriptors  # XD weighted NN (v2)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root run

import argparse
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vfmreg_tpu.kiss.pipeline import OdometryPipeline


class CorridorDataset:
    """Vehicle drives straight down a corridor at 1 m/frame; frames carry D
    position-derived descriptor columns when d > 0."""

    def __init__(self, n_frames=8, d=0, seed=0):
        rng = np.random.RandomState(seed)
        n = 10000
        walls = np.c_[
            rng.uniform(-2, n_frames + 25, (n, 1)),
            np.where(rng.rand(n, 1) < 0.5, -4.0, 4.0) + rng.normal(0, 0.3, (n, 1)),
            rng.uniform(0.2, 4, (n, 1)),
        ]
        # Cross-structure (pillars every ~4 m): without longitudinal features
        # a two-wall corridor leaves x-translation unobservable for geometric
        # ICP — only the descriptor mode could localize.
        px = np.arange(-2.0, n_frames + 25, 4.0)
        pillars = np.concatenate([
            np.c_[
                x + rng.normal(0, 0.1, (300, 1)),
                rng.uniform(-4, 4, (300, 1)),
                rng.uniform(0.2, 4, (300, 1)),
            ]
            for x in px
        ])
        world = np.concatenate([walls, pillars]).astype(np.float32)
        feats = (
            np.sin(world @ rng.normal(size=(3, d)).astype(np.float32) * 0.2)
            if d else None
        )
        self.gt_poses, self.frames = [], []
        for i in range(n_frames):
            T = np.eye(4)
            T[0, 3] = i * 1.0
            self.gt_poses.append(T)
            local = (world - T[:3, 3]).astype(np.float32)
            keep = (np.linalg.norm(local, axis=1) < 25.0) & (local[:, 0] > -1.0)
            frame = local[keep] if feats is None else np.c_[local[keep], feats[keep]]
            self.frames.append(frame)
        self.sequence_id = "corridor"

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx):
        return self.frames[idx]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--descriptors", action="store_true",
                    help="carry 16-d descriptors through odometry (v2 mode)")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    out = Path(tempfile.mkdtemp())
    cfg = out / "cfg.yaml"
    cfg.write_text(f"out_dir: {out}/results\n")
    ds = CorridorDataset(n_frames=args.frames, d=16 if args.descriptors else 0)
    pipe = OdometryPipeline(ds, config=cfg, use_descriptors=args.descriptors)
    results = pipe.run()
    print(results)
    poses = np.load(out / "results" / "latest" / "corridor_poses.npy")
    drift = abs(poses[-1][0, 3] - (args.frames - 1))
    print(f"final pose x = {poses[-1][0, 3]:.3f} m "
          f"(ground truth {args.frames - 1:.1f} m, drift {drift:.3f} m)")
    if drift > 0.5:
        sys.exit("odometry drifted more than 0.5 m")


if __name__ == "__main__":
    main()
