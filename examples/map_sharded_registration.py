"""Register against a map SHARDED over a device mesh (bigger-than-HBM maps).

Runs the flagship method end to end with the map rows tensor-parallel over the
mesh's `model` axis: each device computes the cosine arg-max over its shard
(merged by one all_gather) and grids its shard for ICP (champion caches merged
once per refresh). On a real TPU slice each device holds only M/n_dev map rows
— registration targets beyond one chip's HBM. Here it runs on a virtual
8-device CPU mesh so the collective path is exercised anywhere:

    python examples/map_sharded_registration.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root run

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.geometry.metrics import compute_errors
from vfmreg_tpu.geometry.se3 import inverse_se3, transform_points
from vfmreg_tpu.parallel.mesh import make_mesh, map_sharded_vfm_register


def main():
    mesh = make_mesh(("model",))
    n_dev = len(mesh.devices.flat)
    rng = np.random.RandomState(3)
    m, n, d = 16384, 2048, 64

    pts = np.c_[rng.uniform(-60, 60, (m, 2)), rng.uniform(0, 8, (m, 1))].astype(np.float32)
    feats = np.sin(pts @ rng.normal(size=(3, d)).astype(np.float32) * 0.1).astype(np.float32)

    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R.from_euler("z", 15, degrees=True).as_matrix()
    T_gt[:3, 3] = [4.0, -3.0, 0.3]
    sel = rng.choice(m, n, replace=False)
    scan = np.asarray(transform_points(jnp.asarray(pts[sel]), inverse_se3(jnp.asarray(T_gt))))

    # Map rows shard over the mesh: pad M to a multiple of the axis size with
    # masked rows (the documented contract).
    m_pad = ((m + n_dev - 1) // n_dev) * n_dev
    map_pts = np.zeros((m_pad, 3), np.float32)
    map_feats = np.zeros((m_pad, d), np.float32)
    map_mask = np.zeros((m_pad,), bool)
    map_pts[:m], map_feats[:m], map_mask[:m] = pts, feats, True

    fn = map_sharded_vfm_register(mesh, voxel_size=1.0)
    pose, count = fn(
        jnp.asarray(map_pts), jnp.asarray(map_feats), jnp.asarray(map_mask),
        jnp.asarray(scan), jnp.asarray(feats[sel]), jnp.ones((n,), bool),
        jnp.eye(4, dtype=jnp.float32), 6.0, 0.667,
    )
    rte, rre = compute_errors(np.asarray(pose, np.float64), T_gt.astype(np.float64))
    print(f"{n_dev} devices x {m_pad // n_dev} map rows each | "
          f"correspondences: {int(count)} | RTE {rte:.3f} m  RRE {rre:.3f} deg")
    assert rte < 0.6 and rre < 1.5
    print("recovered the planted offset with the map sharded over the mesh")


if __name__ == "__main__":
    main()
