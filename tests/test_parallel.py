"""Device-mesh parallel registration on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.geometry.se3 import inverse_se3, transform_points
from vfmreg_tpu.parallel.mesh import (
    batched_registration_step,
    make_mesh,
    sharded_ransac,
    sharded_registration_step,
)


def _make_pairs(rng, b, m, n, d=16):
    map_pts = np.zeros((b, m, 3), np.float32)
    map_feats = np.zeros((b, m, d), np.float32)
    scan_pts = np.zeros((b, n, 3), np.float32)
    scan_feats = np.zeros((b, n, d), np.float32)
    poses = []
    for i in range(b):
        pts = np.c_[rng.uniform(-20, 20, (m, 2)), rng.uniform(0, 5, (m, 1))].astype(np.float32)
        feats = np.sin(pts @ rng.normal(size=(3, d)).astype(np.float32) * 0.2)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R.from_euler("z", rng.uniform(-20, 20), degrees=True).as_matrix()
        T[:3, 3] = [rng.uniform(-3, 3), rng.uniform(-3, 3), 0.1]
        sel = rng.choice(m, n, replace=False)
        scan = np.asarray(
            transform_points(jnp.asarray(pts[sel]), inverse_se3(jnp.asarray(T)))
        )
        map_pts[i], map_feats[i] = pts, feats
        scan_pts[i], scan_feats[i] = scan, feats[sel]
        poses.append(T)
    masks_m = np.ones((b, m), bool)
    masks_n = np.ones((b, n), bool)
    return map_pts, map_feats, masks_m, scan_pts, scan_feats, masks_n, poses


@pytest.mark.slow
def test_batched_registration(rng):
    b, m, n = 2, 1024, 256
    mp, mf, mm, sp, sf, sm, poses = _make_pairs(rng, b, m, n)
    got, counts = batched_registration_step(
        jnp.asarray(mp), jnp.asarray(mf), jnp.asarray(mm),
        jnp.asarray(sp), jnp.asarray(sf), jnp.asarray(sm),
    )
    for i in range(b):
        err = np.linalg.norm(np.asarray(got[i])[:3, 3] - poses[i][:3, 3])
        assert err < 0.1, (i, err)
    assert (np.asarray(counts) > 0).all()


@pytest.mark.slow
def test_sharded_registration(rng):
    mesh = make_mesh()
    b = len(jax.devices())
    mp, mf, mm, sp, sf, sm, poses = _make_pairs(rng, b, 512, 128)
    step = sharded_registration_step(mesh)
    got, counts, total = step(
        jnp.asarray(mp), jnp.asarray(mf), jnp.asarray(mm),
        jnp.asarray(sp), jnp.asarray(sf), jnp.asarray(sm),
    )
    assert int(total) == int(np.asarray(counts).sum())
    for i in range(b):
        err = np.linalg.norm(np.asarray(got[i])[:3, 3] - poses[i][:3, 3])
        assert err < 0.1, (i, err)


def test_sharded_ransac_matches_single_device(rng):
    mesh = make_mesh()
    n = 256
    src = np.c_[rng.uniform(-10, 10, (n, 2)), rng.uniform(0, 3, (n, 1))].astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.from_euler("z", 25, degrees=True).as_matrix()
    T[:3, 3] = [2.0, -1.0, 0.2]
    tgt = src @ T[:3, :3].T + T[:3, 3]
    # 25% outliers
    n_out = n // 4
    tgt[:n_out] = rng.uniform(-10, 10, (n_out, 3))
    mask = np.ones(n, bool)

    run = sharded_ransac(mesh, num_hypotheses=2048, chunk=256)
    pose, rmse = run(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
                     jax.random.PRNGKey(0))
    pose = np.asarray(pose)
    # The all-inlier min-RMSE objective (o3d parity) finds a model whose RMSE
    # is no worse than the true pose's RMSE over the contaminated set.
    true_rmse = np.sqrt(np.mean(np.sum((src @ T[:3, :3].T + T[:3, 3] - tgt) ** 2, -1)))
    assert float(rmse) <= true_rmse + 1e-4
    assert np.isfinite(pose).all()


def test_harness_uses_sharded_ransac_on_mesh(tmp_path):
    """With >1 device visible (the 8-device CPU mesh), RegistrationNode shards
    its RANSAC budget over the mesh and the end-to-end registration still
    succeeds (VERDICT r1 item 8)."""
    import jax

    from tests.test_harness import make_world
    from vfmreg_tpu.data.h5io import save_scene
    from vfmreg_tpu.pipeline.registration_node import RegistrationNode

    assert len(jax.devices()) > 1  # conftest forces the virtual 8-CPU mesh

    rng = np.random.RandomState(3)
    pts, feats = make_world(rng, n=4000)
    T = np.eye(4)
    keep = np.abs(pts[:, 0]) < 45
    map_cloud = np.c_[pts[keep], feats[keep]]
    Ts = np.eye(4)
    Ts[:3, 3] = [4.0, 2.0, 0.0]
    sel = rng.choice(len(pts), 2000, replace=False)
    scan_cloud = np.c_[pts[sel] - Ts[:3, 3], feats[sel]]
    save_scene(tmp_path / "scene_000.h5", ["m", "s"], [T], [map_cloud], [Ts], [scan_cloud])

    node = RegistrationNode(
        tmp_path, methods_ransac=[("vfm", False)], methods_teaser=[], methods_pointdsc=[]
    )
    assert node._sharded_ransac is not None
    node.make_step()
    assert node.compute_success_rate("vfm_ransac", 0.6, 1.5) == 1.0


def test_map_sharded_icp_matches_single_grid(rng):
    """tp over map rows: each device grids ONE shard of the map; per-refresh
    champion all_gather. With refresh_interval=1 every iteration is exact in
    both programs, so the sharded pose must match the single-grid pose (the
    champion-UNION contains the global NN; see `parallel.mesh.map_sharded_icp`)
    and both must recover the planted offset."""
    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.parallel.mesh import map_sharded_icp
    from vfmreg_tpu.registration.icp import register_frame_icp

    mesh = make_mesh(("model",))
    m, n = 8192, 1024
    # Sparse occupancy (8192 pts over ~40^3 voxels at 1 m) keeps every voxel
    # under the insertion cap, where per-shard caps == single-grid caps.
    pts = rng.uniform(-20, 20, (m, 3)).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.from_euler("zy", [2.0, -1.0], degrees=True).as_matrix()
    T[:3, 3] = [0.25, -0.2, 0.1]
    sel = rng.choice(m, n, replace=False)
    scan = np.asarray(
        transform_points(jnp.asarray(pts[sel]), inverse_se3(jnp.asarray(T)))
    )
    mm = jnp.ones((m,), bool)
    sm = jnp.ones((n,), bool)
    eye = jnp.eye(4, dtype=jnp.float32)

    grid = build_hash_grid(jnp.asarray(pts), 1.0, mask=mm)
    ref = register_frame_icp(
        grid, jnp.asarray(scan), sm, eye, 2.0, 0.5, refresh_interval=1
    )
    fn = map_sharded_icp(mesh, voxel_size=1.0, refresh_interval=1)
    got = fn(jnp.asarray(pts), mm, jnp.asarray(scan), sm, eye, 2.0, 0.5)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    rte = np.linalg.norm(np.asarray(got)[:3, 3] - T[:3, 3])
    assert rte < 0.05, rte


def test_map_sharded_icp_default_refresh_recovers_pose(rng):
    """Production cadence (refresh_interval=16): the merged champion cache is a
    SUPERSET of the single-grid cache between refreshes, so poses may differ at
    roundoff scale — both must still recover the planted offset."""
    from vfmreg_tpu.parallel.mesh import map_sharded_icp

    mesh = make_mesh(("model",))
    m, n = 4096, 512
    pts = rng.uniform(-15, 15, (m, 3)).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.from_euler("z", 3.0, degrees=True).as_matrix()
    T[:3, 3] = [0.3, 0.15, -0.1]
    sel = rng.choice(m, n, replace=False)
    scan = np.asarray(
        transform_points(jnp.asarray(pts[sel]), inverse_se3(jnp.asarray(T)))
    )
    fn = map_sharded_icp(mesh, voxel_size=1.0)
    got = np.asarray(
        fn(
            jnp.asarray(pts), jnp.ones((m,), bool), jnp.asarray(scan),
            jnp.ones((n,), bool), jnp.eye(4, dtype=jnp.float32), 2.0, 0.5,
        )
    )
    rte = np.linalg.norm(got[:3, 3] - T[:3, 3])
    rre = np.degrees(
        np.arccos(np.clip((np.trace(got[:3, :3].T @ T[:3, :3]) - 1) / 2, -1, 1))
    )
    assert rte < 0.05, rte
    assert rre < 0.5, rre
