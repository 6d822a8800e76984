"""Odometry CLI — the `kiss_icp/tools/cmd.py` (typer `kiss_icp_pipeline`)
equivalent on argparse.

    python -m vfmreg_tpu.kiss.cli DATA_DIR --dataloader generic --visualize ...
"""

from __future__ import annotations

import argparse
from pathlib import Path

from vfmreg_tpu.kiss.datasets import dataset_factory
from vfmreg_tpu.kiss.pipeline import OdometryPipeline


def main():
    parser = argparse.ArgumentParser(description="vfmreg_tpu odometry pipeline")
    parser.add_argument("data_dir", type=str)
    parser.add_argument("--dataloader", default="generic", type=str)
    parser.add_argument("--sequence", default=0)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--deskew", action="store_true")
    parser.add_argument("--max-range", default=None, type=float)
    parser.add_argument("--n-scans", default=-1, type=int)
    parser.add_argument("--jump", default=0, type=int)
    parser.add_argument(
        "--use-descriptors",
        action="store_true",
        help="Keep descriptor columns through voxelization and register on "
        "the XD cosine-weighted path (the reference OdometryServer's v2 "
        "mode); default drops extra columns like v0/v1.",
    )
    parser.add_argument(
        "--platform",
        default=None,
        type=str,
        help="Force a jax backend (e.g. 'cpu'); needed because remote-TPU "
        "plugins can override the JAX_PLATFORMS env var.",
    )
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.dataloader in ("kitti",):
        dataset = dataset_factory(args.dataloader, Path(args.data_dir), int(args.sequence))
    elif args.dataloader in ("nclt",):
        dataset = dataset_factory(args.dataloader, Path(args.data_dir), str(args.sequence))
    else:
        dataset = dataset_factory(args.dataloader, Path(args.data_dir))

    pipeline = OdometryPipeline(
        dataset,
        config=Path(args.config) if args.config else None,
        deskew=args.deskew,
        max_range=args.max_range,
        n_scans=args.n_scans,
        jump=args.jump,
        use_descriptors=args.use_descriptors,
    )
    results = pipeline.run()
    print(results)


if __name__ == "__main__":
    main()
