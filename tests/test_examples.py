"""Smoke-run every `examples/` script (VERDICT r4 item 7): each must exit 0 on
the CPU mesh and print its success line, so the documented entry points can't
rot between releases."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = sorted((REPO / "examples").glob("*.py"))


def _run(path, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    return subprocess.run(
        [sys.executable, str(path), *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )


def test_examples_exist():
    assert [p.name for p in EXAMPLES] == [
        "map_sharded_registration.py",
        "odometry_corridor.py",
        "register_synthetic.py",
    ]


@pytest.mark.parametrize("example", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(example):
    proc = _run(example)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout or "RTE" in proc.stdout or "error" in proc.stdout.lower(), (
        proc.stdout[-2000:]
    )


@pytest.mark.slow
def test_odometry_corridor_descriptor_mode():
    """The v2 descriptor-odometry flag is a distinct code path (XD weighted
    NN) — smoke it separately."""
    proc = _run(REPO / "examples" / "odometry_corridor.py", "--descriptors")
    assert proc.returncode == 0, proc.stderr[-3000:]
