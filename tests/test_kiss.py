"""kiss layer: VoxelHashMap host API, register_frame dispatch, KissICP odometry
on a synthetic corridor trajectory, OdometryPipeline outputs."""

from pathlib import Path

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.config import KISSConfig, load_config
from vfmreg_tpu.kiss import (
    KissICP,
    VoxelHashMap,
    get_voxel_hash_map,
    register_frame,
    voxel_down_sample,
)
from vfmreg_tpu.kiss.pipeline import OdometryPipeline


def test_voxel_down_sample_api(rng):
    pts = rng.uniform(-10, 10, (1000, 3)).astype(np.float32)
    out = voxel_down_sample(pts, 0.5)
    assert out.shape[1] == 3
    assert out.shape[0] < 1000
    # Descriptor columns carried
    ptsd = np.c_[pts, rng.normal(size=(1000, 8)).astype(np.float32)]
    outd = voxel_down_sample(ptsd, 0.5)
    assert outd.shape[1] == 11
    assert outd.shape[0] == out.shape[0]


def test_voxel_hash_map_cap_and_pointcloud(rng):
    m = VoxelHashMap(voxel_size=1.0, max_distance=100.0, max_points_per_voxel=5)
    pts = (0.5 + 0.4 * rng.uniform(-1, 1, (50, 3))).astype(np.float32)  # one voxel
    m.add_points(pts)
    pc = m.point_cloud()
    assert pc.shape[0] == 5
    # First five (insertion order) survive
    got = {tuple(np.round(p, 5)) for p in pc}
    ref = {tuple(np.round(p, 5)) for p in pts[:5]}
    assert got == ref


def test_voxel_hash_map_remove_far(rng):
    m = VoxelHashMap(voxel_size=1.0, max_distance=10.0, max_points_per_voxel=20)
    near = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    far = 50.0 + rng.uniform(0, 5, (100, 3)).astype(np.float32)
    m.add_points(np.concatenate([near, far]))
    m.remove_far_away_points(np.zeros(3))
    pc = m.point_cloud()
    assert np.all(np.linalg.norm(pc, axis=1) < 15.0)


def test_voxel_hash_map_update_transforms(rng):
    m = VoxelHashMap(voxel_size=1.0, max_distance=100.0, max_points_per_voxel=20)
    pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    pose = np.eye(4)
    pose[:3, 3] = [10.0, 0.0, 0.0]
    m.update(pts, pose)
    pc = m.point_cloud()
    assert abs(pc[:, 0].mean() - 10.0) < 1.0


@pytest.mark.slow
def test_get_correspondences_api(rng):
    m = VoxelHashMap(voxel_size=1.0, max_distance=100.0, max_points_per_voxel=20)
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    m.add_points(pts)
    src, tgt = m.get_correspondences(pts[:50] + 0.05, 0.5)
    assert src.shape == tgt.shape
    assert src.shape[0] >= 45  # nearly all should match within 0.5
    assert np.all(np.linalg.norm(src - tgt, axis=1) < 0.5)


def test_get_vfm_correspondences_api(rng):
    m = VoxelHashMap(voxel_size=1.0, max_distance=100.0, max_points_per_voxel=20)
    pts = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    feats = rng.normal(size=(300, 16)).astype(np.float32)
    m.add_points(np.c_[pts, feats])
    src, tgt = m.get_vfm_correspondences(np.c_[pts[:40] + 0.01, feats[:40]], 0.8)
    assert src.shape[0] == 40
    np.testing.assert_allclose(tgt, pts[:40], atol=1e-4)


def _corridor_scan(rng, n=1500):
    """Synthetic corridor: floor + two walls + pillars (x-structure so forward
    motion is observable — a bare corridor is translation-degenerate for ICP)."""
    x = rng.uniform(0, 40, (n, 1))
    kind = rng.randint(0, 3, n)
    y = np.where(kind == 0, rng.uniform(-4, 4, n), np.where(kind == 1, -4.0, 4.0))
    z = np.where(kind == 0, 0.0, rng.uniform(0, 3, n))
    pts = np.c_[x, y[:, None], z[:, None]].astype(np.float32)
    # Transverse walls (doorway-like planes) every 8 m: dense, unambiguous
    # nearest-neighbor pull along x.
    cross = []
    for px in (8.0, 16.0, 24.0, 32.0):
        m = n // 3
        cross.append(
            np.c_[
                np.full((m, 1), px) + rng.normal(0, 0.02, (m, 1)),
                rng.uniform(-4, 4, (m, 1)),
                rng.uniform(0.5, 3, (m, 1)),
            ].astype(np.float32)
        )
    pts = np.concatenate([pts] + cross)
    pts += rng.normal(0, 0.02, pts.shape).astype(np.float32)
    return pts


class CorridorDataset:
    """Vehicle drives straight down a corridor at 1 m/frame."""

    def __init__(self, n_frames=8, seed=0, d=0):
        self.rng = np.random.RandomState(seed)
        self.world = _corridor_scan(self.rng, 8000)
        if d:
            # Position-derived descriptor columns: consistent across frames,
            # like projected VFM features.
            W = self.rng.normal(size=(3, d)).astype(np.float32)
            feats = np.sin(self.world @ W * 0.2).astype(np.float32)
        self.gt_poses = []
        self.frames = []
        for i in range(n_frames):
            T = np.eye(4)
            T[0, 3] = i * 1.0
            self.gt_poses.append(T)
            local = (self.world - T[:3, 3]).astype(np.float32)
            keep = (np.linalg.norm(local, axis=1) < 25.0) & (local[:, 0] > -1.0)
            frame = local[keep]
            if d:
                frame = np.c_[frame, feats[keep]]
            self.frames.append(frame)
        self.sequence_id = "corridor"

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx):
        return self.frames[idx]


@pytest.mark.slow
def test_kiss_icp_odometry_straight_line():
    # voxel = max_range/100 = 1.0 -> 27-voxel search reach ~2 m > 1 m/frame motion
    config = load_config(None, deskew=False, max_range=None)
    ds = CorridorDataset(n_frames=6)
    odom = KissICP(config)
    for i in range(len(ds)):
        odom.register_frame(ds[i], np.zeros(ds[i].shape[0]))
    assert len(odom.poses) == 6
    # Forward motion ~1 m/frame recovered
    final = odom.poses[-1]
    assert abs(final[0, 3] - 5.0) < 0.5
    assert abs(final[1, 3]) < 0.3
    assert abs(final[2, 3]) < 0.3


def test_odometry_pipeline_outputs(tmp_path):
    config_yaml = tmp_path / "cfg.yaml"
    config_yaml.write_text(f"out_dir: {tmp_path}/results\n")
    ds = CorridorDataset(n_frames=5)
    pipe = OdometryPipeline(ds, config=config_yaml)
    results = pipe.run()
    assert not results.empty()
    # Pose dumps exist in all three formats
    assert (tmp_path / "results" / "latest").exists()
    latest = tmp_path / "results" / "latest"
    assert (latest / "corridor_poses.npy").exists()
    assert (latest / "corridor_poses_kitti.txt").exists()
    assert (latest / "corridor_poses_tum.txt").exists()
    assert (latest / "corridor_gt_kitti.txt").exists()
    assert (latest / "config.yml").exists()
    assert (latest / "result_metrics.log").exists()
    poses = np.load(latest / "corridor_poses.npy")
    assert poses.shape == (5, 4, 4)


def test_register_frame_empty_map_returns_guess(rng):
    config = load_config(None, deskew=False, max_range=100.0)
    m = get_voxel_hash_map(config)
    guess = np.eye(4)
    guess[:3, 3] = [1.0, 2.0, 3.0]
    pose = register_frame(rng.uniform(-5, 5, (100, 3)), m, guess, 3.0, 1.0)
    np.testing.assert_allclose(pose, guess)


@pytest.mark.slow
def test_register_frame_vfm_dispatch(rng):
    """[N, 3+D] against a descriptor map goes through the VFM path and recovers
    an offset that pure geometry could not."""
    config = load_config(None, deskew=False, max_range=100.0)
    pts = np.c_[rng.uniform(-40, 40, (2000, 2)), rng.uniform(0, 5, (2000, 1))].astype(np.float32)
    W = rng.normal(size=(3, 16)).astype(np.float32)
    feats = np.sin(pts @ W * 0.12).astype(np.float32)
    m = get_voxel_hash_map(config)
    m.add_points(np.c_[pts, feats])

    T = np.eye(4)
    T[:3, :3] = R.from_euler("z", 20, degrees=True).as_matrix()
    T[:3, 3] = [10.0, -6.0, 0.0]
    scan = (pts - T[:3, 3]) @ T[:3, :3]  # inverse transform
    pose, src, tgt = register_frame(
        np.c_[scan, feats], m, np.eye(4), 3.0, 1.0,
        src_=np.zeros((1, 3)), tgt_=np.zeros((1, 3)),
    )
    assert np.linalg.norm(pose[:3, 3] - T[:3, 3]) < 0.5
    assert src.shape == tgt.shape and src.shape[0] > 0


@pytest.mark.slow
def test_odometry_cli_generic(tmp_path, rng):
    """The odometry CLI end-to-end on a generic .bin directory."""
    import subprocess
    import sys

    data = tmp_path / "scans"
    data.mkdir()
    ds = CorridorDataset(n_frames=3)
    for i in range(3):
        pts = ds[i].astype(np.float32)
        xyzi = np.c_[pts, np.zeros((pts.shape[0], 1), dtype=np.float32)]
        xyzi.astype(np.float32).tofile(data / f"{i:06d}.bin")

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"out_dir: {tmp_path}/results\n")
    out = subprocess.run(
        [sys.executable, "-m", "vfmreg_tpu.kiss.cli", str(data), "--dataloader", "generic",
         "--config", str(cfg), "--platform", "cpu"],
        capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Average Frequency" in out.stdout
    assert (tmp_path / "results" / "latest" / "scans_poses_kitti.txt").exists()


@pytest.mark.slow
def test_device_resident_map_matches_host(rng):
    """Device-resident incremental updates == host/native map semantics:
    same kept point set after caps + far-voxel eviction across several frames."""
    from vfmreg_tpu.kiss.mapping import VoxelHashMap

    def run(device_resident):
        m = VoxelHashMap(voxel_size=1.0, max_distance=30.0, max_points_per_voxel=5,
                         use_native=False, device_resident=device_resident)
        r = np.random.RandomState(0)
        for i in range(4):
            pose = np.eye(4)
            pose[0, 3] = 12.0 * i
            pts = np.c_[r.uniform(-10, 10, (800, 2)), r.uniform(0, 3, (800, 1))].astype(np.float32)
            m.update(pts, pose)
        return np.asarray(sorted(map(tuple, np.round(m.point_cloud(), 4).tolist())))

    host = run(False)
    dev = run(True)
    assert host.shape == dev.shape, (host.shape, dev.shape)
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_device_resident_eviction(rng):
    """Voxels whose first point leaves max_distance of the origin are evicted."""
    from vfmreg_tpu.kiss.mapping import VoxelHashMap

    m = VoxelHashMap(voxel_size=1.0, max_distance=10.0, use_native=False,
                     device_resident=True)
    near = np.array([[1.0, 0.0, 0.0], [2.0, 1.0, 0.0]], dtype=np.float32)
    m.update(near, np.eye(4))
    assert m.point_cloud().shape[0] == 2
    far_pose = np.eye(4)
    far_pose[0, 3] = 100.0
    m.update(np.array([[0.5, 0.0, 0.0]], dtype=np.float32), far_pose)  # lands at 100.5
    pc = m.point_cloud()
    # Old voxels near the original origin are > 10 m from the new origin: evicted.
    assert (np.linalg.norm(pc - far_pose[:3, 3], axis=1) <= 10.0).all()
    assert pc.shape[0] == 1


@pytest.mark.slow
def test_device_resident_map_with_descriptors(rng):
    """Descriptor columns ride along through device-resident updates."""
    from vfmreg_tpu.kiss.mapping import VoxelHashMap

    def run(device_resident):
        m = VoxelHashMap(voxel_size=1.0, max_distance=50.0, max_points_per_voxel=4,
                         use_native=False, device_resident=device_resident)
        r = np.random.RandomState(1)
        for i in range(3):
            pose = np.eye(4)
            pose[1, 3] = 2.0 * i
            xyz = r.uniform(-8, 8, (300, 3)).astype(np.float32)
            feats = np.tanh(xyz @ r.normal(size=(3, 6)).astype(np.float32))
            m.update(np.c_[xyz, feats], pose)
        return m.point_cloud_n()

    host = np.asarray(sorted(map(tuple, np.round(run(False), 4).tolist())))
    dev = np.asarray(sorted(map(tuple, np.round(run(True), 4).tolist())))
    assert host.shape == dev.shape
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_device_map_merge_interval_parity(rng):
    """merge_interval=4 buffers frames but yields the IDENTICAL stored map
    after reads flush; odometry trajectory matches interval=1 on a short run."""
    from vfmreg_tpu.kiss.mapping import VoxelHashMap

    frames = [rng.uniform(-10, 10, (500, 3)).astype(np.float64) for _ in range(5)]
    poses = []
    for i in range(5):
        T = np.eye(4)
        T[0, 3] = 0.3 * i
        poses.append(T)

    maps = {}
    for k in (1, 4):
        m = VoxelHashMap(0.5, 100.0, device_resident=True, merge_interval=k)
        for f, T in zip(frames, poses):
            m.update(f, T)
        maps[k] = m.point_cloud()  # read flushes pending
    a = np.asarray(sorted(map(tuple, np.round(maps[1], 5))))
    b = np.asarray(sorted(map(tuple, np.round(maps[4], 5))))
    np.testing.assert_array_equal(a, b)


def test_device_map_merge_bootstrap_not_empty(rng):
    """Regression: with merge_interval>1 the FIRST update must merge
    immediately — early registrations would otherwise see an empty grid and
    silently return their initial guess (a 3-frame trajectory hole)."""
    from vfmreg_tpu.kiss.mapping import VoxelHashMap

    m = VoxelHashMap(0.5, 100.0, device_resident=True, merge_interval=4)
    m.update(rng.uniform(-5, 5, (300, 3)), np.eye(4))
    assert m._grid is not None
    assert int(m._grid.num_points) > 0


class CorridorXDDataset(CorridorDataset):
    """Corridor frames carrying D descriptor columns (CorridorDataset's `d`)."""

    def __init__(self, n_frames=5, d=8, seed=0):
        super().__init__(n_frames=n_frames, seed=seed, d=d)


@pytest.mark.slow
def test_odometry_pipeline_use_descriptors_v2(tmp_path, monkeypatch):
    """The reference OdometryServer's v2 mode (`OdometryServer.cpp:87-95`,
    use_descriptors_=true): descriptor columns survive voxelization and the
    odometry registers on the XD cosine-weighted path — like the reference's
    server, which always registers through the XD overload
    (`Registration.cpp:384-422`), NEVER VFM-ICP. The corridor trajectory must
    still be recovered."""
    import vfmreg_tpu.kiss.registration as kreg

    xd_calls = []
    real_xd = kreg.register_frame_icp_xd
    monkeypatch.setattr(
        kreg, "register_frame_icp_xd",
        lambda *a, **k: (xd_calls.append(1), real_xd(*a, **k))[1],
    )
    config_yaml = tmp_path / "cfg.yaml"
    config_yaml.write_text(f"out_dir: {tmp_path}/results\n")
    ds = CorridorXDDataset(n_frames=5)
    pipe = OdometryPipeline(ds, config=config_yaml, use_descriptors=True)
    results = pipe.run()
    # Every non-empty-map frame went through the weighted XD dispatch.
    assert len(xd_calls) == 4, len(xd_calls)
    assert not results.empty()
    poses = np.load(tmp_path / "results" / "latest" / "corridor_poses.npy")
    assert poses.shape == (5, 4, 4)
    assert abs(poses[-1][0, 3] - 4.0) < 0.5  # ~1 m/frame forward motion
    assert abs(poses[-1][1, 3]) < 0.3


def test_eval_helpers_accumulate_table_and_plots(tmp_path):
    """`kiss.eval` (reference eval/kiss_icp_eval.py): run_sequence folds each
    sequence's metrics/trajectory into the shared results dict, the table
    averages across sequences, and plotting writes one PNG per sequence."""
    from vfmreg_tpu.kiss.eval import (
        metrics_table,
        plot_trajectories,
        run_sequence,
    )
    from vfmreg_tpu.kiss.pipeline import PipelineResults

    class _StubPipeline:
        dataset_name = "Corridor"

        def __init__(self, sequence):
            self.dataset_sequence = f"{sequence:02d}"
            n = 4
            self.poses = [np.eye(4) for _ in range(n)]
            for i, T in enumerate(self.poses):
                T[0, 3] = float(i)
            self.gt_poses = np.stack(self.poses)
            self._ate = 0.1 * (sequence + 1)

        def run(self):
            r = PipelineResults()
            r.append("Absolute Trajectory Error (ATE)", "m", self._ate)
            r.append("Average Frequency", "Hz", 10.0)
            return r

    results = {}
    for seq in (0, 1):
        run_sequence(_StubPipeline, results, sequence=seq)

    assert results["dataset_name"] == "Corridor"
    assert set(results["trajectories"]) == {"00", "01"}
    assert results["trajectories"]["00"]["poses"].shape == (4, 4, 4)
    ate = results["metrics"]["Absolute Trajectory Error (ATE)"]
    assert ate.units == "m" and ate.values == [pytest.approx(0.1), pytest.approx(0.2)]

    table = metrics_table(results, title="corridor")
    assert "# Experiment Results corridor" in table
    assert "Absolute Trajectory Error (ATE)| 0.15|m |" in table
    assert "Average Frequency| 10.00|Hz |" in table

    figs = plot_trajectories(results, output_dir=str(tmp_path))
    assert len(figs) == 2
    assert (tmp_path / "00_trajectory.png").exists()
    assert (tmp_path / "01_trajectory.png").exists()


def test_shipped_config_files_parse():
    """The in-tree example configs (configs/{basic,advanced}.yaml — role of the
    reference's src/kiss-icp/config/) load through load_config with every key
    landing on a real field."""
    root = Path(__file__).resolve().parent.parent
    basic = load_config(root / "configs" / "basic.yaml")
    assert basic.data.max_range == 100.0 and basic.data.min_range == 5.0
    assert basic.mapping.voxel_size == 1.0  # derived max_range / 100
    adv = load_config(root / "configs" / "advanced.yaml")
    assert adv.data.deskew is True and adv.data.min_range == 0.0
    assert adv.mapping.voxel_size == 1.0  # explicit in the file
    assert adv.adaptive_threshold.fixed_threshold == 0.3
    assert adv.mapping.map_merge_interval == 1
    # Every YAML key must land on a real config field (no silent typos).
    import yaml

    for fname in ("basic.yaml", "advanced.yaml"):
        with open(root / "configs" / fname) as f:
            data = yaml.safe_load(f)
        cfg = KISSConfig()
        for section_name in ("data", "mapping", "adaptive_threshold"):
            for k in (data.get(section_name) or {}):
                assert hasattr(getattr(cfg, section_name), k), (fname, section_name, k)
