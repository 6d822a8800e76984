"""Multi-chip driver regression tests (VERDICT r4 item 1).

Round 4 shipped a crash in the scan-axis-sharded RANSAC branch of
`RegistrationNode._precompute_scene_batched`: with `b >= n_dev` scans on a
mesh and a vfm method row, a tuple unpack shadowed `ms` (the map-sharded
stages dict) with a jnp array, and the later `run_icp` closure string-indexed
it (`TypeError: JAX does not support string indexing`). The harness scene
fixture had b=2 scans on the 8-device conftest mesh, so every test took the
b < n_dev hypothesis-sharded path and the branch had zero coverage while
`MULTICHIP_r04.json` recorded the crash.

These tests drive that exact branch (b == n_dev == 8 on the conftest mesh)
and subprocess-run the shipped `__graft_entry__.dryrun_multichip` health
check so it can never rot between driver runs again.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _make_scene(n_dev, n_map=12000, n_scan=900, d=16, seed=3):
    """A tiny world map + n_dev query scans with KNOWN ground-truth poses."""
    rng = np.random.RandomState(seed)
    mp = np.c_[
        rng.uniform(-40, 40, (n_map, 2)), rng.uniform(0, 6, (n_map, 1))
    ].astype(np.float32)
    W = rng.normal(size=(3, d)).astype(np.float32)
    mf = np.sin(mp @ W * 0.1).astype(np.float32)
    local_map = np.c_[mp, mf]
    scene_poses, scene_clouds = [], []
    for _ in range(n_dev):
        center = rng.uniform(-15, 15, 2)
        near = np.flatnonzero(np.linalg.norm(mp[:, :2] - center, axis=1) < 25.0)
        sel = rng.choice(near, min(n_scan, near.size), replace=False)
        T = np.eye(4)
        T[:2, 3] = center
        scene_poses.append(T)
        scene_clouds.append(np.c_[(mp[sel] - T[:3, 3]).astype(np.float32), mf[sel]])
    scene = {"scene_poses": scene_poses, "scene_point_clouds": scene_clouds}
    return scene, local_map


def test_scan_sharded_vfm_branch_b_ge_ndev(tmp_path):
    """b >= n_dev scans with the vfm row: `stages["ransac"]`/`stages["icp"]`
    (the scan-axis-sharded dispatch, `registration_node.py` `b >= n_dev`
    branch) must run and match the single-device vmapped stages. Fails with
    `TypeError: JAX does not support string indexing` on the unfixed r4 code.
    """
    from vfmreg_tpu.geometry.metrics import compute_errors
    from vfmreg_tpu.pipeline.registration_node import RegistrationNode

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    scene, local_map = _make_scene(n_dev)

    results = {}
    for mode in ("sharded", "vmapped"):
        node = RegistrationNode(
            tmp_path,
            methods_ransac=[("vfm", True)],
            methods_teaser=[],
            methods_pointdsc=[],
            batch_scans=True,
        )
        node.filenames = [Path("scene_regression.h5")]
        if mode == "sharded":
            assert node._sharded_stages is not None
        else:
            node._sharded_stages = None
            node._sharded_ransac = None
        results[mode] = node._precompute_scene_batched(scene, local_map)

    assert results["sharded"]["corr_counts"] == results["vmapped"]["corr_counts"]
    for j in range(n_dev):
        # GT recovery at the paper gate on both paths...
        rte, rre = compute_errors(
            np.asarray(results["sharded"]["vfm_ransac_icp"][j], np.float64),
            scene["scene_poses"][j],
        )
        assert rte < 0.3 and rre < 1.5, (j, rte, rre)
        # ...and scan-sharded == vmapped lane-for-lane. Both paths use the
        # per-scan key PRNGKey(j) for the full hypothesis budget, so the
        # RANSAC winner matches and the refined poses agree to f32
        # shard_map-vs-jit scheduling roundoff.
        np.testing.assert_allclose(
            results["sharded"]["vfm_ransac_icp"][j],
            results["vmapped"]["vfm_ransac_icp"][j],
            atol=1e-4,
            err_msg=f"scan {j}",
        )
        np.testing.assert_allclose(
            results["sharded"]["gt"][j], results["vmapped"]["gt"][j], atol=1e-4
        )


@pytest.mark.slow
def test_dryrun_multichip_end_to_end():
    """Subprocess-run the shipped `__graft_entry__.dryrun_multichip(8)` health
    check — the exact program the driver records as MULTICHIP_r{N}.json — so
    it is exercised by the suite, not only between rounds."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g._dryrun_multichip_impl(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun batched driver" in proc.stdout
