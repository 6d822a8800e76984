"""End-to-end harness test: fabricate a reference-layout H5 scene, run the
RegistrationNode method matrix (vfm + fpfh), check recall and error dumps."""

import pickle

import jax
import numpy as np
import pytest

from vfmreg_tpu.data.h5io import read_scenes, save_scene
from vfmreg_tpu.pipeline.print_errors import main as print_errors_main
from vfmreg_tpu.pipeline.registration_node import RegistrationNode


def make_world(rng, n=6000, d=24, extent=60.0):
    pts = np.c_[
        rng.uniform(-extent, extent, (n, 2)), rng.uniform(0, 8, (n, 1))
    ].astype(np.float32)
    W = rng.normal(size=(3, d)).astype(np.float32)
    feats = np.sin(pts @ W * 0.08).astype(np.float32)
    return pts, feats


@pytest.fixture(scope="module")
def scene_h5(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scenes")
    rng = np.random.RandomState(0)
    pts, feats = make_world(rng)

    # Two overlapping "map scans" in local frames + two query scans.
    map_poses, map_clouds = [], []
    for cx in (-15.0, 15.0):
        T = np.eye(4)
        T[0, 3] = cx
        keep = np.abs(pts[:, 0] - cx) < 40.0
        local = pts[keep] - T[:3, 3]
        map_poses.append(T)
        map_clouds.append(np.c_[local, feats[keep]])

    seq_poses, seq_clouds = [], []
    for cx in (-5.0, 8.0):
        T = np.eye(4)
        T[:3, 3] = [cx, 3.0, 0.0]
        keep = np.linalg.norm(pts[:, :2] - T[:2, 3], axis=1) < 30.0
        local = pts[keep] - T[:3, 3]
        sub = rng.choice(local.shape[0], min(3000, local.shape[0]), replace=False)
        seq_poses.append(T)
        seq_clouds.append(np.c_[local[sub], feats[keep][sub]])

    path = tmp / "scene_000.h5"
    save_scene(path, ["seq_map", "seq_a", "seq_b"], map_poses, map_clouds, seq_poses, seq_clouds)
    return tmp


def test_h5_roundtrip(scene_h5):
    scene = read_scenes(scene_h5 / "scene_000.h5")
    assert len(scene["map_poses"]) == 2
    assert len(scene["scene_poses"]) == 2
    assert scene["map_point_clouds"][0].shape[1] == 27


def test_registration_node_end_to_end(scene_h5, capsys):
    node = RegistrationNode(
        scene_h5,
        methods_ransac=[("vfm", True)],
        methods_teaser=[("vfm", False)],
        methods_pointdsc=[],
        batch_scans=True,  # exercise the batched per-scene path
    )
    node.make_step()
    assert node.stop_publishing is False or node.scene_idx == 1
    # vfm_ransac_icp errors recorded for both scans and registration succeeded
    assert len(node.trans_errors["vfm_ransac_icp"]) == 2
    recall = node.compute_success_rate("vfm_ransac_icp", 0.6, 1.5)
    assert recall == 1.0, (node.trans_errors, node.rot_errors)

    out = capsys.readouterr().out
    assert "Correspondences" in out
    assert "(batched)" in out  # the batched precompute actually ran
    assert "Rotation error" in out


def test_batched_driver_no_vfm_skips_vfm_stages(scene_h5, capsys, monkeypatch):
    """A method matrix without the vfm row must not pay the descriptor-map
    grid build / matching / 50k-hypothesis RANSAC in the batched precompute —
    and the rows it does produce must match the serial path exactly."""
    import vfmreg_tpu.ops.matching as matching_mod
    import vfmreg_tpu.parallel.mesh as mesh_mod

    calls = {"match": 0, "ransac": 0}
    orig_match = matching_mod.get_vfm_correspondences_batched
    orig_ransac = mesh_mod.batched_ransac

    def counting_match(*a, **k):
        calls["match"] += 1
        return orig_match(*a, **k)

    def counting_ransac(*a, **k):
        calls["ransac"] += 1
        return orig_ransac(*a, **k)

    errs = {}
    for batch in (True, False):
        node = RegistrationNode(
            scene_h5,
            methods_ransac=[],
            methods_teaser=[],
            methods_pointdsc=[],
            batch_scans=batch,
        )
        if batch:
            monkeypatch.setattr(matching_mod, "get_vfm_correspondences_batched", counting_match)
            monkeypatch.setattr(mesh_mod, "batched_ransac", counting_ransac)
            orig_map_hash = node._map_hash
            built = []

            def spying_map_hash(lm, with_descriptors=False):
                built.append(with_descriptors)
                return orig_map_hash(lm, with_descriptors=with_descriptors)

            node._map_hash = spying_map_hash
        node.make_step()
        if batch:
            monkeypatch.undo()
            # BIND the skip: neither the batched matcher, the batched RANSAC,
            # nor the with-descriptors map build may run for a vfm-free matrix.
            assert calls == {"match": 0, "ransac": 0}, calls
            assert True not in built, built
        assert len(node.trans_errors["icp"]) == 2
        assert "vfm_ransac_icp" not in node.trans_errors
        errs[batch] = (node.trans_errors["icp"], node.rot_errors["icp"])
        if batch:
            out = capsys.readouterr().out
            assert "(batched)" in out
    # Bit-identical on one device; under a multi-device mesh the batched ICP
    # compiles through shard_map, whose program can differ from the plain jit
    # at f32 reduction-order roundoff (~1e-7 observed on the 8-device CPU mesh).
    np.testing.assert_allclose(errs[True][0], errs[False][0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(errs[True][1], errs[False][1], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_batched_driver_matches_serial(scene_h5):
    """The vmapped per-scene path (`_precompute_scene_batched`) matches the
    serial per-scan loop: same voxelizations, same per-scan PRNG streams,
    jax's while-loop batching masks per-lane carries (VERDICT r2 item 3).

    With the PLAIN vmapped stages, GT / vanilla-ICP rows are bit-identical.
    The vfm RANSAC rows go through `parallel.mesh.batched_ransac` (vmapped
    lanes of the same program), whose poses agree with the serial dispatches
    to f32 roundoff (<=1e-7); after the ICP refinement (GN exit at
    |dx| < 1e-4) the error values may differ at the solver-tolerance level,
    far below the 0.3 m / 0.6 m recall gates.

    On a multi-device host the batched driver instead places its stages with
    `shard_map` (`parallel.mesh.sharded_driver_stages`), where XLA may
    schedule the f32 reductions differently from plain jit — those rows are
    pinned at solver roundoff (~1e-6 observed), with the recall-level
    agreement asserted by `__graft_entry__.dryrun_multichip` and
    `tests/test_parallel.py`."""
    results = {}
    for mode in ("sharded", "vmapped", "serial"):
        if mode == "sharded" and len(jax.devices()) < 2:
            continue  # single-device host: covered by "vmapped"
        node = RegistrationNode(
            scene_h5,
            methods_ransac=[("vfm", True)],
            methods_teaser=[],
            methods_pointdsc=[],
            batch_scans=mode != "serial",
        )
        if mode == "vmapped":
            # Force the single-device vmapped stages (the bit-identity
            # contract); "sharded" keeps whatever the host's mesh gives.
            # `_sharded_ransac` stays: at b < n_dev the batched and serial
            # paths both shard the hypothesis budget per scan, so keeping it
            # preserves the identical PRNG stream the parity pin relies on.
            node._sharded_stages = None
        node.make_step()
        results[mode] = (node.trans_errors, node.rot_errors)
    for method in results["vmapped"][0]:
        for kind in (0, 1):
            b = results["serial"][kind][method]
            a = results["vmapped"][kind][method]
            if "ransac" in method:
                np.testing.assert_allclose(a, b, atol=2e-3, err_msg=method)
            else:
                np.testing.assert_array_equal(a, b, err_msg=method)
            if "sharded" in results and method != "vfm_ransac":
                # The RAW vfm_ransac row is skipped: the mesh splits the
                # hypothesis budget over per-device key streams
                # (`parallel.mesh.sharded_ransac`), so a different — equally
                # valid — min-RMSE winner can surface; its quality is pinned
                # in tests/test_parallel.py and its ICP refinement below.
                # The refined row (vfm_ransac_icp) IS pinned even though its
                # seed pose may differ: these are error MAGNITUDES vs GT, and
                # on this scene every valid winner refines to sub-mm, so
                # |err_a - err_b| <= err_a + err_b << 2e-3. A violation means
                # the sharded pipeline produced a genuinely bad registration
                # (a real regression), not benign seed drift — and the scene/
                # keys are fixed, so the check is deterministic per host.
                s = results["sharded"][kind][method]
                tol = 2e-3 if "ransac" in method else 1e-5
                np.testing.assert_allclose(s, b, atol=tol, err_msg=f"sharded {method}")


def test_error_dump_and_print(scene_h5, tmp_path):
    node = RegistrationNode(
        scene_h5, methods_ransac=[("vfm", True)], methods_teaser=[], methods_pointdsc=[]
    )
    node.make_step()
    pkl = tmp_path / "mode.pkl"
    node.dump_errors(pkl)
    with open(pkl, "rb") as f:
        data = pickle.load(f)
    assert "rot" in data and "trans" in data

    recalls = print_errors_main(pkl, error_txt_dir=tmp_path)
    assert (tmp_path / "error.txt").exists()
    assert recalls["vfm_ransac_icp"][(0.6, 1.5)] == 100.0


def test_visualize_scene(scene_h5, tmp_path):
    from vfmreg_tpu.pipeline.visualize_scenes import visualize_scene

    png = tmp_path / "scene.png"
    map_pts, scan_pts = visualize_scene(
        scene_h5 / "scene_000.h5", save_png=png, export_ply_dir=tmp_path / "ply"
    )
    assert png.exists() and png.stat().st_size > 1000
    assert (tmp_path / "ply" / "scene_000_map.ply").exists()
    assert map_pts.shape[1] == 3 and map_pts.shape[0] > 100


def test_refresh_interval_recall_neutral(scene_h5):
    """Candidate-cache staleness (refresh_interval=16) does not change the
    registration outcome vs per-iteration-exact search (=1) on the scene."""
    import jax.numpy as jnp

    from vfmreg_tpu.data.h5io import read_scenes
    from vfmreg_tpu.kiss.voxelization import voxel_down_sample
    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.registration.icp import register_frame_icp
    from vfmreg_tpu.utils import transform_pcl

    scene = read_scenes(scene_h5 / "scene_000.h5")
    map_pts = transform_pcl(scene["map_point_clouds"][0], scene["map_poses"][0])[:, :3]
    scan = transform_pcl(scene["scene_point_clouds"][0], scene["scene_poses"][0])[:, :3]
    scan = voxel_down_sample(scan, 0.5).astype(np.float32)
    # small perturbation
    guess = np.eye(4, dtype=np.float32)
    guess[:3, 3] = [0.4, -0.3, 0.1]

    def pad(x):
        import jax.numpy as jnp
        from vfmreg_tpu.ops.voxel import bucket_size

        n = bucket_size(x.shape[0])
        out = np.zeros((n, 3), dtype=np.float32)
        out[: x.shape[0]] = x
        m = np.zeros(n, dtype=bool)
        m[: x.shape[0]] = True
        return jnp.asarray(out), jnp.asarray(m)

    gp, gm = pad(map_pts.astype(np.float32))
    sp, sm = pad(scan)
    grid = build_hash_grid(gp, 1.0, mask=gm)
    poses = {}
    for ri in (1, 16):
        poses[ri] = np.asarray(
            register_frame_icp(grid, sp, sm, jnp.asarray(guess), 3.0, 0.5, refresh_interval=ri)
        )
    np.testing.assert_allclose(poses[1], poses[16], atol=2e-3)


@pytest.mark.slow
def test_batched_driver_retry_merge_matches_serial(tmp_path):
    """A scan small enough that its 5 m voxelization yields < 75 vfm
    correspondences takes the 1 m retry (`registration_node.py:420-423`). The
    batched path merges the retried rows ON DEVICE into the 5 m batch; this
    pins that merge against the serial per-scan loop and asserts the retry
    actually fired.

    Unlike `test_batched_driver_matches_serial` (equal-size scans -> equal pad
    widths -> bit-identical), the scans here land in different size buckets:
    the batch pads the small scan to the large scan's bucket, which reorders
    the f32 GN reductions. Rows are compared at solver-roundoff tolerance
    (observed deltas up to ~3e-5 deg)."""
    from vfmreg_tpu.data.h5io import save_scene as _save

    rng = np.random.RandomState(5)
    pts, feats = make_world(rng, n=9000)
    T0 = np.eye(4)
    map_clouds = [np.c_[pts, feats]]

    seq_poses, seq_clouds = [], []
    # One normal scan and one SMALL scan (radius 8 m -> a handful of 5 m voxels).
    for cx, radius in ((-5.0, 30.0), (6.0, 8.0)):
        T = np.eye(4)
        T[:3, 3] = [cx, 2.0, 0.0]
        keep = np.linalg.norm(pts[:, :2] - T[:2, 3], axis=1) < radius
        local = pts[keep] - T[:3, 3]
        seq_poses.append(T)
        seq_clouds.append(np.c_[local, feats[keep]])

    _save(tmp_path / "scene_000.h5", ["m", "a", "b"], [T0], map_clouds, seq_poses, seq_clouds)

    results = {}
    retried = None
    for batch in (True, False):
        node = RegistrationNode(
            tmp_path,
            methods_ransac=[("vfm", True)],
            methods_teaser=[],
            methods_pointdsc=[],
            batch_scans=batch,
        )
        if batch:
            scene = node._read_scene(0)
            local_map = node._accumulate_map(scene)
            pre = node._precompute_scene_batched(scene, local_map)
            retried = pre["retried"]
            node._read_scene(0)  # re-cache for make_step below
        node.scene_idx = 0
        node.make_step()
        results[batch] = (node.trans_errors, node.rot_errors)

    assert retried == [1], retried  # the small scan took the 1 m pass
    for method in results[True][0]:
        for kind in (0, 1):
            a = results[True][kind][method]
            b = results[False][kind][method]
            atol = 2e-3 if "ransac" in method else 1e-4
            np.testing.assert_allclose(a, b, atol=atol, rtol=1e-4, err_msg=method)


def test_map_descriptor_cache_resets_per_scene(scene_h5):
    """The per-method map-descriptor cache must reset at each scene's first
    scan (reference `registration_node.py:876-877`) — without it, scene N+1's
    baseline rows would match against scene N's cached map descriptors."""
    node = RegistrationNode(
        scene_h5,
        methods_ransac=[],
        methods_teaser=[],
        methods_pointdsc=[],
        batch_scans=False,
    )
    node.map_descriptor_cache["fpfh"] = ("stale-sentinel", None)
    node.make_step()
    assert node.map_descriptor_cache.get("fpfh", (None,))[0] != "stale-sentinel"


def test_device_preprocess_parity(scene_h5):
    """Device-side scan preprocessing (`_preprocess_scans_device`) against the
    host voxelize chain: identical first-wins voxel SETS in the same insertion
    row order (`ops/voxel.py:voxel_down_sample_masked` maps selections back to
    original order), equal correspondence counts, and method-row poses within
    f32 roundoff of the host-preproc batched path (padded operand WIDTHS can
    still differ between the two paths — the device path buckets to q_budget —
    so RANSAC's sampling, and hence its raw pose, is equivalent rather than
    bit-identical; the ICP rows run on identical sets)."""
    from vfmreg_tpu.data.h5io import read_scenes

    scene = read_scenes(scene_h5 / "scene_000.h5")
    results = {}
    for dev_pre in (False, True):
        node = RegistrationNode(
            scene_h5,
            methods_ransac=[("vfm", True)],
            methods_teaser=[],
            methods_pointdsc=[],
            batch_scans=True,
            device_preprocess=dev_pre,
        )
        local_map = node._accumulate_map(scene)
        results[dev_pre] = node._precompute_scene_batched(scene, local_map)

    host, dev = results[False], results[True]
    assert host["scan_sizes"] == dev["scan_sizes"]
    assert host["corr_counts"] == dev["corr_counts"]
    assert host["retried"] == dev["retried"]
    # ICP rows run on identical point sets -> same optimum to f32 roundoff.
    np.testing.assert_allclose(dev["gt"], host["gt"], atol=1e-4)
    np.testing.assert_allclose(dev["icp"], host["icp"], atol=1e-4)
    # The vfm+RANSAC+ICP row: RANSAC sampling differs with row order, but the
    # refined pose must land on the same registration (the recall contract).
    np.testing.assert_allclose(
        dev["vfm_ransac_icp"], host["vfm_ransac_icp"], atol=5e-3
    )


def test_device_preprocess_voxel_sets_match_host():
    """Set-level pin of `_preprocess_scans_device` vs the host voxelize chain
    on one raw cloud: the 0.1->0.5v->1.0v survivors and the 5 m query set are
    the SAME point sets (C-trunc first-wins on both sides)."""
    import jax.numpy as jnp

    from vfmreg_tpu.kiss.voxelization import voxel_down_sample
    from vfmreg_tpu.pipeline.registration_node import _preprocess_scans_device

    rng = np.random.RandomState(5)
    d = 8
    pc = np.c_[
        rng.uniform(-30, 30, (4000, 2)), rng.uniform(0, 5, (4000, 1)),
        rng.normal(size=(4000, d)),
    ].astype(np.float32)

    # Host chain: 0.1 -> 0.5 -> 1.0 -> 5.0 (voxel_size=1.0).
    h1 = voxel_down_sample(pc, 0.1)
    h2 = voxel_down_sample(voxel_down_sample(h1, 0.5), 1.0)
    h5 = voxel_down_sample(h2, 5.0)

    raw = jnp.asarray(pc[None])
    mask = jnp.ones((1, pc.shape[0]), bool)
    p3, f3, m3, c3, q5, qf5, qm5, q5t = _preprocess_scans_device(
        raw, mask, voxel_size=1.0
    )
    got2 = np.asarray(p3[0])[np.asarray(m3[0])]
    got5 = np.asarray(q5[0])[np.asarray(qm5[0])]

    def as_set(a):
        return set(map(tuple, np.round(a[:, :3].astype(np.float64), 6)))

    assert int(c3[0]) == h2.shape[0]
    assert as_set(got2) == as_set(h2)
    assert int(q5t[0]) == h5.shape[0]
    assert as_set(got5) == as_set(h5)


def test_device_preprocess_retry_non_integer_voxel_size(tmp_path):
    """At voxel_size=0.5 the reference's 1 m retry voxelization
    (`registration_node.py:420-423`) is NOT an identity over the
    double-voxelized cloud — two 0.5 m survivors can share a 1 m voxel —
    so the device-preprocess path must actually run the 1 m pass on the
    retried rows (regression: it used to reuse the 0.5 m set as-is, which
    was only correct for integer voxel sizes). Pins device == host retry
    decisions and correspondence counts, and the ICP rows within roundoff."""
    from vfmreg_tpu.data.h5io import save_scene as _save

    rng = np.random.RandomState(5)
    pts, feats = make_world(rng, n=9000)
    map_clouds = [np.c_[pts, feats]]

    seq_poses, seq_clouds = [], []
    # One normal scan and one SMALL scan that takes the 1 m retry.
    for cx, radius in ((-5.0, 30.0), (6.0, 8.0)):
        T = np.eye(4)
        T[:3, 3] = [cx, 2.0, 0.0]
        keep = np.linalg.norm(pts[:, :2] - T[:2, 3], axis=1) < radius
        local = pts[keep] - T[:3, 3]
        seq_poses.append(T)
        seq_clouds.append(np.c_[local, feats[keep]])

    _save(tmp_path / "scene_000.h5", ["m", "a", "b"], [np.eye(4)], map_clouds,
          seq_poses, seq_clouds)

    results = {}
    for dev_pre in (False, True):
        node = RegistrationNode(
            tmp_path,
            methods_ransac=[("vfm", True)],
            methods_teaser=[],
            methods_pointdsc=[],
            batch_scans=True,
            device_preprocess=dev_pre,
        )
        node.config.mapping.voxel_size = 0.5
        scene = node._read_scene(0)
        local_map = node._accumulate_map(scene)
        results[dev_pre] = node._precompute_scene_batched(scene, local_map)

    host, dev = results[False], results[True]
    assert dev["retried"] == [1], dev["retried"]  # the small scan retried
    assert host["retried"] == dev["retried"]
    assert host["scan_sizes"] == dev["scan_sizes"]
    # The retried row's count comes from the 1 m-voxelized query set; without
    # the explicit 1 m pass the device row would carry ~4x the queries.
    assert host["corr_counts"] == dev["corr_counts"]
    np.testing.assert_allclose(dev["gt"], host["gt"], atol=1e-4)


def test_device_preprocess_q5_budget_overflow_rematches(scene_h5, capsys):
    """A scan with more occupied 5 m voxels than the static query budget is
    re-matched at full width (sync-1 overflow path), so correspondence counts
    and method-row poses equal the host chain's instead of silently running
    on a truncated query set."""
    from vfmreg_tpu.data.h5io import read_scenes

    scene = read_scenes(scene_h5 / "scene_000.h5")
    results = {}
    for dev_pre in (False, True):
        node = RegistrationNode(
            scene_h5,
            methods_ransac=[("vfm", True)],
            methods_teaser=[],
            methods_pointdsc=[],
            batch_scans=True,
            device_preprocess=dev_pre,
        )
        if dev_pre:
            node._q5_budget = 4  # force overflow on every scan
        local_map = node._accumulate_map(scene)
        results[dev_pre] = node._precompute_scene_batched(scene, local_map)
    assert "re-matching them at full width" in capsys.readouterr().out
    host, dev = results[False], results[True]
    assert host["corr_counts"] == dev["corr_counts"]
    assert host["retried"] == dev["retried"]
    np.testing.assert_allclose(dev["gt"], host["gt"], atol=1e-4)
    np.testing.assert_allclose(
        dev["vfm_ransac_icp"], host["vfm_ransac_icp"], atol=5e-3
    )


def test_device_preprocess_skips_query_pass_without_vfm(scene_h5):
    """`want_query=False` (vfm-free method matrix) skips the 5 m voxelize
    entirely — q5 outputs are None — and the driver still completes the
    non-vfm rows on the device-preprocess path."""
    import jax.numpy as jnp

    from vfmreg_tpu.pipeline.registration_node import _preprocess_scans_device

    raw = jnp.zeros((2, 64, 11), jnp.float32)
    raw = raw.at[:, :, :3].set(
        jnp.asarray(np.random.RandomState(0).uniform(-20, 20, (2, 64, 3)), jnp.float32)
    )
    mask = jnp.ones((2, 64), bool)
    p, f, m, c, q5x, q5f, q5m, q5t = _preprocess_scans_device(
        raw, mask, voxel_size=1.0, want_query=False
    )
    assert q5x is None and q5f is None and q5m is None and q5t is None
    assert p.shape == (2, 64, 3) and f.shape == (2, 64, 8)

    node = RegistrationNode(
        scene_h5,
        methods_ransac=[],
        methods_teaser=[],
        methods_pointdsc=[],
        batch_scans=True,
        device_preprocess=True,
    )
    node.make_step()
    assert len(node.trans_errors["icp"]) == 2


def test_map_sharded_driver_matches_vmapped(scene_h5):
    """The bigger-than-HBM scene mode (`RegistrationNode(map_sharding=True)`,
    map rows tensor-sharded over the mesh) against the single-device vmapped
    driver: same correspondence counts and retry decisions, GT/vanilla rows at
    shard_map-scheduling roundoff, and the refined flagship row within the
    recall contract."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    results = {}
    for mode in ("map_sharded", "vmapped"):
        node = RegistrationNode(
            scene_h5,
            methods_ransac=[("vfm", True)],
            methods_teaser=[],
            methods_pointdsc=[],
            batch_scans=True,
            map_sharding=mode == "map_sharded",
        )
        if mode == "vmapped":
            node._sharded_stages = None  # plain single-device vmapped stages
        assert (node._map_sharded_stages is not None) == (mode == "map_sharded")
        node.make_step()
        results[mode] = (node.trans_errors, node.rot_errors)
    for method in results["vmapped"][0]:
        for kind in (0, 1):
            a = results["map_sharded"][kind][method]
            b = results["vmapped"][kind][method]
            # The b < n_dev vmapped baseline runs the SAME hypothesis-sharded
            # RANSAC stream the map-sharded mode reproduces over its model
            # axis, so even the raw RANSAC row is comparable (2e-3). GT starts
            # at the true pose and exits inside the first champion-refresh
            # window, where the merged per-shard cache is EXACT (1e-5). The
            # vanilla row runs hundreds of iterations BETWEEN refreshes, where
            # the merged cache — a superset of the single-grid champions — can
            # legitimately resolve a closer cached point after motion; both
            # are within the epoch-cache approximation class — a proportional
            # bound (observed ~1 % relative on this scene's partially-
            # converged vanilla errors).
            if method == "icp":
                np.testing.assert_allclose(a, b, rtol=0.05, atol=1e-3, err_msg=method)
            else:
                np.testing.assert_allclose(a, b, atol=2e-3, err_msg=method)


def test_dump_viz_writes_parseable_artifacts(scene_h5, tmp_path):
    """`--dump-viz` (VERDICT r4 item 6): both driver paths write per-scan
    map/GT/estimate PLYs plus inlier correspondences as segment pairs, and the
    files parse (counted vertices/edges match their headers)."""

    def parse_ply(path):
        with open(path) as f:
            n_v = n_e = 0
            for line in f:
                line = line.strip()
                if line.startswith("element vertex"):
                    n_v = int(line.split()[-1])
                elif line.startswith("element edge"):
                    n_e = int(line.split()[-1])
                elif line == "end_header":
                    break
            body = [ln.split() for ln in f]
        assert len(body) == n_v + n_e
        verts = np.asarray([[float(x) for x in r[:3]] for r in body[:n_v]])
        assert np.isfinite(verts).all()
        return n_v, n_e

    for batch in (True, False):
        out = tmp_path / ("batched" if batch else "serial")
        node = RegistrationNode(
            scene_h5,
            methods_ransac=[("vfm", True)],
            methods_teaser=[],
            methods_pointdsc=[],
            batch_scans=batch,
            dump_viz_dir=out,
        )
        node.make_step()
        scene_dir = out / "scene_000"
        assert (scene_dir / "map.ply").exists()
        n_v, _ = parse_ply(scene_dir / "map.ply")
        assert n_v > 100
        for i in range(2):
            for kind in (f"scan_{i:02d}_gt.ply", f"scan_{i:02d}_est_vfm_ransac_icp.ply"):
                n_v, _ = parse_ply(scene_dir / kind)
                assert n_v > 100, kind
            n_v, n_e = parse_ply(scene_dir / f"scan_{i:02d}_correspondences.ply")
            assert n_e > 10 and n_v == 2 * n_e
