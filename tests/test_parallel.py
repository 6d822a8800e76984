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


def test_map_sharded_icp_padded_masked_rows(rng):
    """The documented contract pads M to a multiple of the mesh size with
    masked rows; masked padding must not poison champion selection (equality
    with the unpadded single-grid program at refresh_interval=1)."""
    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.parallel.mesh import map_sharded_icp
    from vfmreg_tpu.registration.icp import register_frame_icp

    mesh = make_mesh(("model",))
    n_dev = len(jax.devices())
    m_real, n = 3001, 512  # deliberately not divisible by the mesh size
    m_pad = ((m_real + n_dev - 1) // n_dev) * n_dev
    pts = rng.uniform(-15, 15, (m_real, 3)).astype(np.float32)
    mp = np.zeros((m_pad, 3), np.float32)
    mp[:m_real] = pts
    # Padding rows sit NEAR a scanned point but offset 0.3 m, masked off — if
    # the mask leaked they would win that query's championship and visibly
    # drag the pose, breaking the exact parity assert below.
    mp[m_real:] = pts[0] + np.float32(0.3)
    mmask = np.zeros((m_pad,), bool)
    mmask[:m_real] = True

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.from_euler("z", 2.0, degrees=True).as_matrix()
    T[:3, 3] = [0.25, -0.15, 0.05]
    sel = rng.choice(m_real, n, replace=False)
    sel[0] = 0  # guarantee the poisoned neighborhood is queried
    scan = np.asarray(
        transform_points(jnp.asarray(pts[sel]), inverse_se3(jnp.asarray(T)))
    )
    sm = jnp.ones((n,), bool)
    eye = jnp.eye(4, dtype=jnp.float32)

    grid = build_hash_grid(jnp.asarray(pts), 1.0, mask=jnp.ones((m_real,), bool))
    ref = register_frame_icp(
        grid, jnp.asarray(scan), sm, eye, 2.0, 0.5, refresh_interval=1
    )
    fn = map_sharded_icp(mesh, voxel_size=1.0, refresh_interval=1)
    got = fn(
        jnp.asarray(mp), jnp.asarray(mmask), jnp.asarray(scan), sm, eye, 2.0, 0.5
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_map_sharded_vfm_register_end_to_end(rng):
    """Flagship method on a tp-sharded map: per-shard cosine arg-max merged by
    max, per-shard grids merged at champion refreshes. Correspondence output
    must equal the single-device search exactly (contiguous row blocks +
    first-max tie-breaks); the registered pose must recover the planted GT and
    match the single-device `register_frame_vfm` flow."""
    import jax.numpy as jnp

    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.ops.matching import get_vfm_correspondences
    from vfmreg_tpu.parallel.mesh import map_sharded_vfm_register
    from vfmreg_tpu.registration.vfm_icp import register_frame_vfm

    mesh = make_mesh(("model",))
    m, n, d = 8192, 1024, 32
    pts = np.c_[
        rng.uniform(-25, 25, (m, 2)), rng.uniform(0, 6, (m, 1))
    ].astype(np.float32)
    feats = np.sin(pts @ rng.normal(size=(3, d)).astype(np.float32) * 0.15)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.from_euler("z", 12.0, degrees=True).as_matrix()
    T[:3, 3] = [3.0, -2.0, 0.2]
    sel = rng.choice(m, n, replace=False)
    scan = np.asarray(
        transform_points(jnp.asarray(pts[sel]), inverse_se3(jnp.asarray(T)))
    )
    sfeats = feats[sel]
    mm = jnp.ones((m,), bool)
    sm = jnp.ones((n,), bool)
    eye = jnp.eye(4, dtype=jnp.float32)

    fn = map_sharded_vfm_register(mesh, voxel_size=1.0)
    pose, count = fn(
        jnp.asarray(pts), jnp.asarray(feats), mm,
        jnp.asarray(scan), jnp.asarray(sfeats), sm, eye, 3.0, 0.5,
    )
    pose = np.asarray(pose)
    assert int(count) == n

    # single-device flow on the full map for parity
    grid = build_hash_grid(jnp.asarray(pts), 1.0, mask=mm)
    corr = get_vfm_correspondences(
        jnp.asarray(pts), jnp.asarray(feats), mm,
        jnp.asarray(scan), jnp.asarray(sfeats), sm,
    )
    ref, *_ = register_frame_vfm(grid, jnp.asarray(scan), sm, corr, eye, 3.0, 0.5)

    rte = np.linalg.norm(pose[:3, 3] - T[:3, 3])
    rre = np.degrees(
        np.arccos(np.clip((np.trace(pose[:3, :3].T @ T[:3, :3]) - 1) / 2, -1, 1))
    )
    assert rte < 0.1, rte
    assert rre < 0.5, rre
    np.testing.assert_allclose(pose, np.asarray(ref), atol=5e-4)


def test_map_sharded_correspondences_match_single_device(rng):
    """Exact parity (values AND tie-breaks) of the map-sharded cosine search
    vs the single-device one, with duplicate-descriptor rows planted across
    shard boundaries to force cross-device ties."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from vfmreg_tpu.ops.matching import (
        get_vfm_correspondences,
        get_vfm_correspondences_map_sharded,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh(("model",))
    m, n, d = 1024, 256, 16
    pts = rng.uniform(-10, 10, (m, 3)).astype(np.float32)
    feats = rng.normal(size=(m, d)).astype(np.float32)
    # Plant exact duplicate descriptors in different shards: the winner must
    # be the LOWEST global row in both programs.
    shard = m // n_dev
    feats[3 * shard + 7] = feats[5]
    feats[6 * shard + 1] = feats[shard + 2]
    scan_pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    scan_feats = feats[rng.choice(m, n, replace=False)] + 0.0
    mm = np.ones((m,), bool)
    mm[::17] = False  # masked rows exercised too
    sm = jnp.ones((n,), bool)

    ref = get_vfm_correspondences(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mm),
        jnp.asarray(scan_pts), jnp.asarray(scan_feats), sm,
    )
    run = jax.jit(
        jax.shard_map(
            lambda mp, mf, mmask, sp, sf, smask: get_vfm_correspondences_map_sharded(
                mp, mf, mmask, sp, sf, smask, "model"
            ),
            mesh=mesh,
            in_specs=(P("model"), P("model"), P("model"), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    got = run(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mm),
        jnp.asarray(scan_pts), jnp.asarray(scan_feats), sm,
    )
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
    np.testing.assert_allclose(
        np.asarray(got.similarity), np.asarray(ref.similarity), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.target), np.asarray(ref.target), atol=0
    )


def test_dp_map_sharded_vfm_register_matches_single_device(rng):
    """dp x tp (2-D mesh): 4 scans sharded over `data`, one map tp-sharded
    over `model`. Every scan must recover its planted GT and match the
    single-device `register_frame_vfm` flow per scan."""
    import jax.numpy as jnp

    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.ops.matching import get_vfm_correspondences
    from vfmreg_tpu.parallel.mesh import dp_map_sharded_vfm_register
    from vfmreg_tpu.registration.vfm_icp import register_frame_vfm

    n_dev = len(jax.devices())
    if n_dev % 2:
        pytest.skip("needs an even device count for a 2-D mesh")
    mesh = make_mesh(("data", "model"), shape=(2, n_dev // 2))

    m, n, d, b = 8192, 1024, 32, 4
    pts = np.c_[
        rng.uniform(-25, 25, (m, 2)), rng.uniform(0, 6, (m, 1))
    ].astype(np.float32)
    feats = np.sin(pts @ rng.normal(size=(3, d)).astype(np.float32) * 0.15)
    scans, sfeats, gts = [], [], []
    for j in range(b):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R.from_euler("z", 5.0 + 4.0 * j, degrees=True).as_matrix()
        T[:3, 3] = [1.0 + j, -2.0 + 0.5 * j, 0.2]
        sel = rng.choice(m, n, replace=False)
        scans.append(
            np.asarray(transform_points(jnp.asarray(pts[sel]), inverse_se3(jnp.asarray(T))))
        )
        sfeats.append(feats[sel])
        gts.append(T)
    sps = jnp.asarray(np.stack(scans))
    sfs = jnp.asarray(np.stack(sfeats))
    sms = jnp.ones((b, n), bool)
    guesses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    mm = jnp.ones((m,), bool)

    fn = dp_map_sharded_vfm_register(mesh, voxel_size=1.0)
    poses, counts = fn(
        jnp.asarray(pts), jnp.asarray(feats), mm, sps, sfs, sms, guesses, 3.0, 0.5
    )
    poses = np.asarray(poses)
    assert list(np.asarray(counts)) == [n] * b

    grid = build_hash_grid(jnp.asarray(pts), 1.0, mask=mm)
    for j in range(b):
        corr = get_vfm_correspondences(
            jnp.asarray(pts), jnp.asarray(feats), mm, sps[j], sfs[j], sms[j]
        )
        ref, *_ = register_frame_vfm(
            grid, sps[j], sms[j], corr, jnp.eye(4, dtype=jnp.float32), 3.0, 0.5
        )
        rte = np.linalg.norm(poses[j][:3, 3] - gts[j][:3, 3])
        rre = np.degrees(
            np.arccos(
                np.clip((np.trace(poses[j][:3, :3].T @ gts[j][:3, :3]) - 1) / 2, -1, 1)
            )
        )
        assert rte < 0.1, (j, rte)
        assert rre < 0.5, (j, rre)
        np.testing.assert_allclose(poses[j], np.asarray(ref), atol=5e-4)


def test_hypothesis_sharded_batched_ransac_matches_serial_loop():
    """The 2-axis (scan x hypothesis-block) dispatch returns the SAME poses as
    b sequential `sharded_ransac` calls (identical per-scan key split and
    per-device hypothesis share), so the driver's b < n_dev path can use one
    dispatch (VERDICT r4 weak #4)."""
    import jax
    import jax.numpy as jnp

    from vfmreg_tpu.parallel.mesh import (
        hypothesis_sharded_batched_ransac,
        make_mesh,
        sharded_ransac,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh()
    rng = np.random.RandomState(3)
    b, n = 3, 256
    src = rng.uniform(-20, 20, (b, n, 3)).astype(np.float32)
    tgt = np.empty_like(src)
    gts = []
    for j in range(b):
        th = rng.uniform(-0.5, 0.5)
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = rng.uniform(-5, 5, 3).astype(np.float32)
        tgt[j] = src[j] @ R.T + t
        bad = rng.choice(n, n // 4, replace=False)
        tgt[j, bad] = rng.uniform(-25, 25, (len(bad), 3))
        T = np.eye(4, dtype=np.float32); T[:3, :3] = R; T[:3, 3] = t
        gts.append(T)
    mask = jnp.ones((b, n), bool)

    serial_fn = sharded_ransac(mesh, num_hypotheses=4096)
    serial = np.stack([
        np.asarray(serial_fn(jnp.asarray(src[j]), jnp.asarray(tgt[j]), mask[j],
                             jax.random.PRNGKey(j))[0])
        for j in range(b)
    ])
    batched_fn = hypothesis_sharded_batched_ransac(mesh, num_hypotheses=4096)
    keys = jnp.stack([jax.random.PRNGKey(j) for j in range(b)])
    batched = np.asarray(batched_fn(jnp.asarray(src), jnp.asarray(tgt), mask, keys))
    np.testing.assert_allclose(batched, serial, atol=1e-6)
    # Loose sanity gate only: the raw (unrefined) RANSAC pose at this small
    # budget is coarse; its QUALITY is pinned by test_ransac.py — the contract
    # here is the dispatch-layout parity asserted above.
    from vfmreg_tpu.geometry.metrics import compute_errors
    for j in range(b):
        rte, rre = compute_errors(batched[j].astype(np.float64), gts[j].astype(np.float64))
        assert rte < 2.0 and rre < 10.0, (j, rte, rre)


def _far_field_icp_batch(rng, b=4, m=5000, n=700):
    """One shared map grid + b scans at far-field offsets with known GT."""
    from vfmreg_tpu.ops.hash_grid import build_hash_grid

    pts = np.c_[
        rng.uniform(-35, 35, (m, 2)), rng.uniform(0, 6, (m, 1))
    ].astype(np.float32)
    grid = build_hash_grid(jnp.asarray(pts), 1.0)
    scans = np.zeros((b, n, 3), np.float32)
    gts = []
    for j in range(b):
        # Varied offset magnitudes -> varied convergence speed across lanes.
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R.from_euler("z", rng.uniform(-4, 4) * (j + 1) / b, degrees=True).as_matrix()
        T[:2, 3] = rng.uniform(-1.0, 1.0, 2) * (j + 1)
        sel = rng.choice(m, n, replace=False)
        scans[j] = np.asarray(
            transform_points(jnp.asarray(pts[sel]), inverse_se3(jnp.asarray(T)))
        )
        gts.append(T)
    mask = jnp.ones((b, n), bool)
    guesses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    return grid, jnp.asarray(scans), mask, guesses, gts


def test_batched_icp_two_phase_settled_is_bit_identical(rng):
    """Lanes that fresh-confirm within the phase-1 budget pass through the
    two-phase dispatch UNchanged: bit-identical to the single full-budget
    dispatch (the while_loop would have terminated at the same iterate)."""
    from vfmreg_tpu.parallel.mesh import (
        batched_icp,
        batched_icp_stats,
        batched_icp_two_phase,
    )
    from vfmreg_tpu.registration.icp import FAR_FIELD_PHASE1_ITERATIONS

    grid, scans, mask, guesses, _ = _far_field_icp_batch(rng)
    md, k = jnp.float32(3.0), jnp.float32(0.5)
    # Precondition (else this test is vacuous): every lane settles in phase 1.
    _, _, settled = batched_icp_stats(
        grid, scans, mask, guesses, md, k,
        rebuild_mode="planes", max_iterations=FAR_FIELD_PHASE1_ITERATIONS,
    )
    assert bool(np.asarray(settled).all()), "fixture must settle in phase 1"
    single = batched_icp(grid, scans, mask, guesses, md, k, rebuild_mode="planes")
    two = batched_icp_two_phase(grid, scans, mask, guesses, md, k)
    np.testing.assert_array_equal(np.asarray(two), np.asarray(single))


def test_batched_icp_two_phase_crossing_matches_serial_replay(rng):
    """Lanes that exhaust phase 1 resume compacted; each lane's result matches
    the per-scan serial two-phase replay (stats + conditional resume — the
    program `kiss.registration.register_frame(two_phase=True)` runs) at
    solver roundoff, and every lane still recovers its ground-truth pose.

    Roundoff, not bit-equality: XLA lowers the vmapped program's f32
    reductions with a different association than the single-lane program
    (measured ~1e-7 pose deltas between identical-math dispatches at b=1 vs
    unbatched), so cross-granularity comparisons pin at 1e-5 — the same class
    as the sharded-vs-vmapped pins in tests/test_harness.py."""
    from vfmreg_tpu.geometry.metrics import compute_errors
    from vfmreg_tpu.parallel.mesh import batched_icp_two_phase
    from vfmreg_tpu.registration.icp import (
        MAX_NUM_ITERATIONS,
        register_frame_icp,
        register_frame_icp_stats,
    )

    grid, scans, mask, guesses, gts = _far_field_icp_batch(rng)
    md, k = jnp.float32(3.0), jnp.float32(0.5)
    P1 = 6  # tiny budget to force phase-boundary crossings
    two = np.asarray(
        batched_icp_two_phase(
            grid, scans, mask, guesses, md, k, phase1_iters=P1
        )
    )
    crossed = 0
    for j in range(scans.shape[0]):
        pose1, _, settled = register_frame_icp_stats(
            grid, scans[j], mask[j], guesses[j], md, k, max_iterations=P1
        )
        if bool(settled):
            serial = pose1
        else:
            crossed += 1
            serial = register_frame_icp(
                grid, scans[j], mask[j], jnp.asarray(pose1), md, k,
                max_iterations=MAX_NUM_ITERATIONS - P1,
            )
        np.testing.assert_allclose(
            two[j], np.asarray(serial), atol=1e-5, err_msg=f"lane {j}"
        )
        rte, rre = compute_errors(two[j].astype(np.float64), np.asarray(gts[j], np.float64))
        assert rte < 0.3 and rre < 1.5, (j, rte, rre)
    assert crossed >= 1, "fixture must cross the phase boundary"
