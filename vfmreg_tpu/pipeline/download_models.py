"""Baseline checkpoint fetcher + converter — `download_baseline_models.py`
(reference #39) equivalent.

Downloads the six baseline checkpoints (and the DINOv2 backbone) to
`~/.cache/vfmreg_tpu/` and converts each torch state dict into the env-var
paths the extractors read. In zero-egress environments, run with
`--convert-only` after placing the files manually; the table below documents
the exact artifacts (same sources as `download_baseline_models.py:10-60`).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

CHECKPOINTS = {
    # name: (filename, source URL, env var consumed by the extractor)
    "fcgf": (
        "2019-07-31_19-37-00.pth",
        "https://node1.chrischoy.org/data/publications/fcgf/2019-07-31_19-37-00.pth",
        "VFMREG_FCGF_WEIGHTS",
    ),
    "dip": (
        "final_chkpt.pth",
        "gdrive:1wMaFrTJUCAQIqsye5hD7OJD2Vmq8hL6x",  # DIP release (gdown id)
        "VFMREG_DIP_WEIGHTS",
    ),
    "gedi": (
        "chkpt.tar",
        "gdrive:1Ngvr1NYcDuD1LsYRYpuuMBmoY8DSpVcH",  # GeDi 3DMatch checkpoint
        "VFMREG_GEDI_WEIGHTS",
    ),
    "gcl": (
        "kitti_chkpt.pth",
        "gdrive:1wJ5tW8g3pLtS1PZ1bVSvXwqNDJ7rwjMk",  # GCL KITTI checkpoint
        "VFMREG_GCL_WEIGHTS",
    ),
    "spinnet": (
        "KITTI_best.pkl",
        "https://github.com/QingyongHu/SpinNet/raw/main/pretrain/KITTI_best.pkl",
        "VFMREG_SPINNET_WEIGHTS",
    ),
    "pointdsc": (
        "model_best.pkl",
        "https://github.com/XuyangBai/PointDSC/raw/master/snapshot/PointDSC_KITTI_release/models/model_best.pkl",
        "VFMREG_POINTDSC_WEIGHTS",
    ),
    "dinov2": (
        "dinov2_vits14_pretrain.pth",
        "https://dl.fbaipublicfiles.com/dinov2/dinov2_vits14/dinov2_vits14_pretrain.pth",
        "VFMREG_DINOV2_WEIGHTS",
    ),
    # CLIP BPE merge table for the text tower (`models.clip_text`).
    "clip_bpe": (
        "bpe_simple_vocab_16e6.txt.gz",
        "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz",
        "VFMREG_CLIP_BPE",
    ),
    # OpenAI CLIP ViT-B/16 (MaskCLIP backbone + text tower weights).
    "clip_vitb16": (
        "ViT-B-16.pt",
        "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
        "VFMREG_CLIP_WEIGHTS",
    ),
}


def cache_dir() -> Path:
    return Path(os.environ.get("VFMREG_CACHE", Path.home() / ".cache" / "vfmreg_tpu"))


def download(name: str, dest: Path) -> bool:
    filename, url, _ = CHECKPOINTS[name]
    target = dest / filename
    if name == "clip_bpe" and not target.exists():
        # The merge table is vendored in-tree (`data/clip/`, like the
        # reference's `src/featup_data/`) — copy instead of fetching.
        from vfmreg_tpu.models.clip_text import DEFAULT_BPE_PATH

        if DEFAULT_BPE_PATH.exists():
            import shutil

            target.parent.mkdir(parents=True, exist_ok=True)
            shutil.copyfile(DEFAULT_BPE_PATH, target)
    if target.exists():
        return True
    dest.mkdir(parents=True, exist_ok=True)
    try:
        if url.startswith("gdrive:"):
            import gdown  # optional; not available in zero-egress images

            gdown.download(id=url.split(":", 1)[1], output=str(target), quiet=False)
        else:
            import urllib.request

            urllib.request.urlretrieve(url, target)
        return target.exists()
    except Exception as e:
        print(f"[{name}] download failed ({type(e).__name__}: {e}); "
              f"place {filename} at {target} manually")
        return False


def export_env(dest: Path) -> None:
    """Print (and set) the env vars pointing the extractors at the files."""
    for name, (filename, _, env) in CHECKPOINTS.items():
        target = dest / filename
        if target.exists():
            os.environ[env] = str(target)
            print(f"export {env}={target}")
        else:
            print(f"# missing: {name} -> {target}")


def verify_loadable(dest: Path) -> None:
    """Round-trip each present checkpoint through its converter."""
    import torch

    converters = {}
    from vfmreg_tpu.models.dip import load_dip_state_dict
    from vfmreg_tpu.models.gedi import load_gedi_state_dict
    from vfmreg_tpu.models.pointdsc import load_pointdsc_state_dict
    from vfmreg_tpu.models.sparse_resunet import FCGF_CONFIG, GCL_CONFIG, load_me_state_dict
    from vfmreg_tpu.models.spinnet import load_spinnet_state_dict
    from vfmreg_tpu.models.vit import PRESETS, load_torch_state_dict

    converters["fcgf"] = lambda sd: load_me_state_dict(sd.get("state_dict", sd), FCGF_CONFIG)
    converters["gcl"] = lambda sd: load_me_state_dict(sd.get("state_dict", sd), GCL_CONFIG)
    converters["dip"] = load_dip_state_dict
    converters["gedi"] = lambda sd: load_gedi_state_dict(sd.get("pnet_model_state_dict", sd))
    converters["spinnet"] = load_spinnet_state_dict
    converters["pointdsc"] = load_pointdsc_state_dict
    converters["dinov2"] = lambda sd: load_torch_state_dict(sd, PRESETS["dinov2_vits14"])

    for name, (filename, _, _) in CHECKPOINTS.items():
        target = dest / filename
        if not target.exists():
            continue
        if name not in converters:
            # Entries with no torch converter (the CLIP BPE vocab gz, the
            # jit-archived ViT-B-16.pt) would crash torch.load/KeyError here.
            print(f"[{name}] present (no converter check)")
            continue
        sd = torch.load(target, map_location="cpu")
        if hasattr(sd, "items"):
            sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
        converters[name](sd)
        print(f"[{name}] converted OK")


def self_test() -> int:
    """Zero-egress converter verification.

    Runs every registered converter against the in-tree golden fixtures
    (state dicts captured from the reference repo's OWN torch modules by
    `tests/torch_oracles/gen_reference_goldens.py`) and the random-weight
    transformers parity suites for the DINOv2/CLIP towers — no downloads.
    This is the strongest verification available without the published
    checkpoints (`download_baseline_models.py:10-33` needs egress); with
    egress, `--verify` additionally round-trips the real files.
    """
    tests = Path(__file__).resolve().parents[2] / "tests"
    if not (tests / "test_reference_goldens.py").exists():
        # A wheel install ships no tests/ tree — a skip, not a failure
        # (exit 0 so scripts don't read the benign skip as a converter
        # verification failure; the message records that nothing ran).
        print(
            "SKIPPED: --self-test needs a source checkout "
            "(tests/golden fixtures not found); no converters were verified"
        )
        return 0
    import pytest

    return pytest.main(
        [
            str(tests / "test_reference_goldens.py"),
            str(tests / "test_maskclip.py"),
            str(tests / "test_vit.py"),
            str(tests / "test_clip_text.py"),
            "-q",
            "-m",
            "",
            "-p",
            "no:cacheprovider",
        ]
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dest", type=str, default=None)
    parser.add_argument("--convert-only", action="store_true")
    parser.add_argument("--verify", action="store_true")
    parser.add_argument(
        "--self-test",
        action="store_true",
        help="verify every converter against the in-tree reference goldens "
        "and transformers parity suites (no downloads needed)",
    )
    args = parser.parse_args()
    dest = Path(args.dest) if args.dest else cache_dir()

    if args.self_test:
        raise SystemExit(self_test())
    if not args.convert_only:
        for name in CHECKPOINTS:
            download(name, dest)
    export_env(dest)
    if args.verify:
        verify_loadable(dest)


if __name__ == "__main__":
    main()
