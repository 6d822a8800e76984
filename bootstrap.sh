#!/usr/bin/env bash
# One-command clean-machine setup — the role of the reference's Dockerfile
# (Dockerfile:1-119: CUDA base + ROS + pinned pip installs). No ROS here:
# the transport layer is the TCP/JSON ComputeTransform service, and the
# compute stack is JAX (CPU wheel by default; see --tpu).
#
#   ./bootstrap.sh            # venv + pinned deps + editable install + native build + smoke test
#   ./bootstrap.sh --tpu      # same, but installs jax[tpu]
#   ./bootstrap.sh --no-venv  # install into the current interpreter
set -euo pipefail
cd "$(dirname "$0")"

USE_VENV=1
TPU=0
for arg in "$@"; do
  case "$arg" in
    --no-venv) USE_VENV=0 ;;
    --tpu) TPU=1 ;;
    *) echo "unknown arg: $arg" >&2; exit 2 ;;
  esac
done

if [ "$USE_VENV" = 1 ]; then
  python3 -m venv .venv
  # shellcheck disable=SC1091
  source .venv/bin/activate
fi

python -m pip install --upgrade pip
python -m pip install -r requirements.txt
if [ "$TPU" = 1 ]; then
  python -m pip install "jax[tpu]==0.9.0"
fi
python -m pip install -e .

# Native runtime (C++ KD-tree + voxel hash; ctypes C-ABI, no pybind11 needed).
make -C vfmreg_tpu/native

# Smoke test: one synthetic scan-to-map registration through the public API.
python - <<'EOF'
import os
import jax
# Decide the platform WITHOUT probing backends (a probe initializes whatever
# plugin is installed, which can be slow on tunneled setups): honor an explicit
# JAX_PLATFORMS=tpu, otherwise pin CPU.
if os.environ.get("JAX_PLATFORMS", "").lower() != "tpu":
    jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from vfmreg_tpu.ops.hash_grid import build_hash_grid
from vfmreg_tpu.ops.matching import get_vfm_correspondences
from vfmreg_tpu.registration.vfm_icp import register_frame_vfm
from vfmreg_tpu.geometry.se3 import transform_points, inverse_se3
from vfmreg_tpu.geometry.metrics import compute_errors
from scipy.spatial.transform import Rotation as R

rng = np.random.RandomState(7); n, d = 2000, 32
pts = np.c_[rng.uniform(-50, 50, (n, 2)), rng.uniform(0, 8, (n, 1))].astype(np.float32)
feats = np.sin(pts @ rng.normal(size=(3, d)).astype(np.float32) * 0.1).astype(np.float32)
T = np.eye(4, dtype=np.float32)
T[:3, :3] = R.from_euler("z", 30, degrees=True).as_matrix(); T[:3, 3] = [15, -10, 0.5]
scan = np.asarray(transform_points(jnp.asarray(pts), inverse_se3(jnp.asarray(T))))
mask = jnp.ones(n, dtype=bool)
grid = build_hash_grid(jnp.asarray(pts), 1.0, feats=jnp.asarray(feats))
corr = get_vfm_correspondences(grid.points, grid.feats, grid.valid,
                               jnp.asarray(scan), jnp.asarray(feats), mask, chunk=1024)
pose, *_ = register_frame_vfm(grid, jnp.asarray(scan), mask, corr, jnp.eye(4), 3.0, 0.5)
rte, rre = compute_errors(np.asarray(pose), T)
assert rte < 0.3 and rre < 1.5, (rte, rre)
print(f"bootstrap smoke test OK: RTE {rte:.4f} m, RRE {rre:.4f} deg on {jax.default_backend()}")
EOF

echo "vfmreg-tpu bootstrap complete."
