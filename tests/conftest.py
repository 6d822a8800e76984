"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The environment may pin JAX_PLATFORMS to a remote TPU plugin (slow over a tunnel
for many small test ops), so we force the CPU backend both via env (for child
processes) and via jax.config (which wins over plugin-registered defaults).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
