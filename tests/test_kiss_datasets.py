"""Synthesized-fixture tests for the kiss odometry dataset loaders.

Covers the 15-name `dataset_factory` matrix of the reference
(`src/kiss-icp/python/kiss_icp/datasets/`): each filesystem-backed loader gets
a tiny fabricated dataset; container-backed loaders (mcap/rosbag/ouster) are
checked for clean gating when their container library is absent; the
PointCloud2 decoder is tested against a duck-typed message.
"""

import os
import types

import numpy as np
import pytest

from vfmreg_tpu.kiss.datasets import dataset_factory


def _rot_z(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _quat_from_matrix(R):
    """(w, x, y, z) from a rotation matrix (for fixture writing)."""
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return w, x, y, z


# --------------------------------------------------------------------- io
def test_pcd_reader_ascii_and_binary(tmp_path):
    from vfmreg_tpu.data.cloud_io import read_pcd_xyz

    pts = np.array([[1.0, 2.0, 3.0], [-4.0, 0.5, 9.0]], np.float32)
    header = (
        "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
        "COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\n"
    )
    a = tmp_path / "a.pcd"
    a.write_text(header + "DATA ascii\n" + "\n".join(" ".join(map(str, p)) for p in pts))
    b = tmp_path / "b.pcd"
    b.write_bytes((header + "DATA binary\n").encode() + pts.tobytes())
    np.testing.assert_allclose(read_pcd_xyz(a), pts, atol=1e-6)
    np.testing.assert_allclose(read_pcd_xyz(b), pts, atol=1e-6)


def test_ply_reader_binary_with_timestamp(tmp_path):
    from vfmreg_tpu.data.cloud_io import read_ply

    pts = np.array([[0.5, 1.5, -2.0], [3.0, 4.0, 5.0]], np.float32)
    ts = np.array([100.0, 200.0], np.float64)
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property double timestamp\nend_header\n"
    )
    rows = b"".join(pts[i].tobytes() + ts[i].tobytes() for i in range(2))
    p = tmp_path / "f.ply"
    p.write_bytes(header.encode() + rows)
    cols = read_ply(p)
    np.testing.assert_allclose(
        np.column_stack([cols["x"], cols["y"], cols["z"]]), pts, atol=1e-6
    )
    np.testing.assert_allclose(cols["timestamp"], ts)


def test_point_cloud2_decoder():
    from vfmreg_tpu.kiss.point_cloud2 import read_point_cloud

    n = 5
    xyz = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    t = np.linspace(10, 20, n).astype(np.float32)
    point_step = 16
    buf = np.zeros((n, point_step), np.uint8)
    buf[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    buf[:, 12:16] = t[:, None].view(np.uint8)

    def field(name, offset, datatype):
        return types.SimpleNamespace(name=name, offset=offset, datatype=datatype, count=1)

    msg = types.SimpleNamespace(
        fields=[field("x", 0, 7), field("y", 4, 7), field("z", 8, 7), field("time", 12, 7)],
        width=n, height=1, point_step=point_step, row_step=n * point_step,
        data=buf.tobytes(), is_bigendian=False,
    )
    pts, ts = read_point_cloud(msg)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(ts, np.linspace(0, 1, n), atol=1e-6)


# ----------------------------------------------------------------- loaders
def test_apollo_loader(tmp_path):
    from vfmreg_tpu.data.cloud_io import read_pcd  # noqa: F401  (import check)

    (tmp_path / "pcds").mkdir()
    (tmp_path / "poses").mkdir()
    pts = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
    header = (
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        "WIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA binary\n"
    )
    for i in range(3):
        (tmp_path / "pcds" / f"{i}.pcd").write_bytes(header.encode() + pts.tobytes())
    rows = []
    for i in range(3):
        R = _rot_z(0.1 * i)
        w, x, y, z = _quat_from_matrix(R)
        rows.append([i, 0.0, 1.0 * i, 2.0 * i, 0.0, x, y, z, w])
    np.savetxt(tmp_path / "poses" / "gt_poses.txt", np.array(rows))

    ds = dataset_factory("apollo", tmp_path)
    assert len(ds) == 3
    np.testing.assert_allclose(ds[0], pts, atol=1e-6)
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-9)
    # local pose 1 = inv(P0) @ P1
    np.testing.assert_allclose(ds.gt_poses[1][:3, 3], [1.0, 2.0, 0.0], atol=1e-6)


def test_boreas_loader(tmp_path):
    (tmp_path / "lidar").mkdir()
    (tmp_path / "applanix").mkdir()
    scan = np.random.RandomState(0).randn(10, 6).astype(np.float32)
    (tmp_path / "lidar" / "0.bin").write_bytes(scan.tobytes())
    hdr = "t,x,y,z,vx,vy,vz,r,p,ya,wz,wy,wx"
    rows = np.zeros((1, 13))
    rows[0, 1:4] = [1.0, 2.0, 3.0]
    np.savetxt(tmp_path / "applanix" / "lidar_poses.csv", rows, delimiter=",", header=hdr)

    ds = dataset_factory("boreas", tmp_path)
    pts, ts = ds[0]
    np.testing.assert_allclose(pts, scan[:, :3], atol=1e-6)
    assert np.all((ts >= 0) & (ts <= 1))
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-6)


def test_kitti_raw_loader(tmp_path):
    drive = tmp_path / "2011_09_30" / "2011_09_30_drive_0016_sync"
    (drive / "velodyne_points" / "data").mkdir(parents=True)
    (drive / "oxts" / "data").mkdir(parents=True)
    n_frames = 4  # benchmark range for seq 04 is [0, 270]; 4 files is a subset
    scan = np.random.RandomState(1).randn(50, 4).astype(np.float32)
    for i in range(n_frames):
        (drive / "velodyne_points" / "data" / f"{i:010d}.bin").write_bytes(scan.tobytes())
        vals = np.zeros(30)
        vals[0] = 49.0 + 1e-5 * i  # lat
        vals[1] = 8.43 + 1e-5 * i  # lon
        vals[2] = 112.0  # alt
        np.savetxt(drive / "oxts" / "data" / f"{i:010d}.txt", vals[None])
    calib = tmp_path / "2011_09_30"
    with open(calib / "calib_imu_to_velo.txt", "w") as f:
        f.write("calib_time: x\nR: 1 0 0 0 1 0 0 0 1\nT: 0.1 0.2 0.3\n")

    ds = dataset_factory("kitti_raw", tmp_path, sequence=4)
    assert ds.sequence_id == "04"
    assert len(ds) == n_frames
    pts, ts = ds[0]
    assert pts.shape[1] == 3 and np.all((ts >= 0) & (ts <= 1))
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-9)
    assert np.linalg.norm(ds.gt_poses[-1][:3, 3]) > 0.1  # GPS motion shows up


def test_ncd_loader(tmp_path):
    scans = tmp_path / "raw_format" / "ouster_scan"
    gt = tmp_path / "ground_truth"
    scans.mkdir(parents=True)
    gt.mkdir()
    pts = np.random.RandomState(2).randn(7, 3).astype(np.float32)
    header = (
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        "WIDTH 7\nHEIGHT 1\nPOINTS 7\nDATA binary\n"
    )
    for name in ("cloud_1583836591_182590976.pcd", "cloud_1583836592_182590976.pcd"):
        (scans / name).write_bytes(header.encode() + pts.tobytes())
    rows = np.zeros((2, 9))
    rows[:, 8] = 1.0  # identity quats (qw last column)
    rows[1, 2:5] = [1.0, 0.0, 0.0]
    np.savetxt(gt / "registered_poses.csv", rows, delimiter=",", header="sec,nsec,x,y,z,qx,qy,qz,qw")

    ds = dataset_factory("ncd", tmp_path)
    assert len(ds) == 2
    p, ts = ds[0]
    np.testing.assert_allclose(p, pts, atol=1e-6)
    np.testing.assert_allclose(ds.gt_poses[1][:3, 3], [1, 0, 0], atol=1e-9)


def test_nuscenes_loader(tmp_path):
    import json

    tdir = tmp_path / "v1.0-mini"
    tdir.mkdir()
    scan = np.random.RandomState(3).randn(20, 5).astype(np.float32)
    (tmp_path / "sweeps").mkdir()
    fn = "sweeps/lidar_top_0.pcd.bin"
    (tmp_path / fn).write_bytes(scan.tobytes())

    def dump(name, rows):
        (tdir / f"{name}.json").write_text(json.dumps(rows))

    dump("scene", [{"token": "sc0", "name": "scene-0001", "first_sample_token": "sa0"}])
    dump("sample", [{"token": "sa0"}])
    dump("sample_data", [
        {"token": "sd0", "sample_token": "sa0", "filename": fn, "prev": "", "next": "",
         "ego_pose_token": "ep0", "calibrated_sensor_token": "cs0"},
    ])
    dump("ego_pose", [{"token": "ep0", "rotation": [1, 0, 0, 0], "translation": [5, 6, 7]}])
    dump("calibrated_sensor", [{"token": "cs0", "rotation": [1, 0, 0, 0], "translation": [0.1, 0, 0]}])

    ds = dataset_factory("nuscenes", tmp_path, sequence=1)
    assert len(ds) == 1
    np.testing.assert_allclose(ds[0], scan[:, :3], atol=1e-6)
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-9)


def test_paris_luco_loader(tmp_path):
    frames = tmp_path / "frames"
    frames.mkdir()
    pts = np.array([[1, 0, 0], [0, 2, 0]], np.float32)
    ts = np.array([1.0, 4.0], np.float64)
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property double timestamp\nend_header\n"
    )
    rows = b"".join(pts[i].tobytes() + ts[i].tobytes() for i in range(2))
    (frames / "frame_0.ply").write_bytes(header.encode() + rows)
    np.savetxt(tmp_path / "gt_traj_lidar.txt", np.array([[1.0, 2.0, 3.0]]))

    ds = dataset_factory("paris_luco", tmp_path)
    p, t = ds[0]
    np.testing.assert_allclose(p, pts, atol=1e-6)
    np.testing.assert_allclose(t, [0.25, 1.0])
    fixed = ds.apply_calibration(ds.gt_poses)
    np.testing.assert_allclose(fixed[0][:3, :3], np.eye(3))


def test_tum_loader(tmp_path):
    from PIL import Image

    (tmp_path / "depth").mkdir()
    (tmp_path / "rgb").mkdir()
    depth = np.zeros((8, 8), np.uint16)
    depth[2, 3] = 5000  # 1 m
    depth[4, 4] = 10000  # 2 m
    Image.fromarray(depth, mode="I;16").save(tmp_path / "depth" / "0.png")
    (tmp_path / "depth.txt").write_text("1.00 depth/0.png\n")
    (tmp_path / "groundtruth.txt").write_text("1.00 1 2 3 0 0 0 1\n")

    ds = dataset_factory("tum", tmp_path)
    pts = ds[0]
    assert pts.shape == (2, 3)
    np.testing.assert_allclose(sorted(pts[:, 2]), [1.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(ds.gt_poses[0][:3, 3], [1, 2, 3])


@pytest.mark.parametrize("name,needs", [
    ("mcap", "mcap"), ("rosbag", "rosbags"), ("ouster", "ouster-sdk"),
])
def test_container_loaders_gate_cleanly(tmp_path, name, needs):
    """Container-backed loaders exist in the factory and raise a clear
    ImportError naming the missing package (reference parity: those loaders
    sys.exit with an install hint)."""
    f = tmp_path / "data.bin"
    f.write_bytes(b"\x00")
    with pytest.raises(ImportError, match=needs.split("-")[0]):
        dataset_factory(name, f, topic="/points")


def test_factory_covers_all_reference_names():
    from vfmreg_tpu.kiss.datasets import _FACTORY

    reference_names = {
        "generic", "kitti", "nclt", "mulran", "apollo", "boreas", "kitti_raw",
        "mcap", "ncd", "nuscenes", "ouster", "paris_luco", "rosbag", "tum",
    }
    assert reference_names <= set(_FACTORY)
