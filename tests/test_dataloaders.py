"""Direct tests for the dataset loaders and small utilities that are otherwise
only exercised indirectly: kiss datasets, KITTI odometry loader, radius_knn,
logging pose printer."""

import numpy as np
import jax.numpy as jnp
import pytest


def _make_kitti_tree(root, n_frames=3, seq=0):
    """Fabricate a minimal KITTI odometry tree (velodyne + calib + poses)."""
    rng = np.random.RandomState(0)
    seqdir = root / "sequences" / f"{seq:02d}"
    (seqdir / "velodyne").mkdir(parents=True)
    (seqdir / "image_2").mkdir(parents=True)
    for i in range(n_frames):
        pts = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
        xyzi = np.c_[pts, np.zeros((500, 1), np.float32)].astype(np.float32)
        xyzi.tofile(seqdir / "velodyne" / f"{i:06d}.bin")
        from PIL import Image

        Image.fromarray(np.zeros((32, 64, 3), dtype=np.uint8)).save(
            seqdir / "image_2" / f"{i:06d}.png"
        )
    P2 = np.c_[700 * np.eye(3), np.zeros(3)].reshape(-1)
    Tr = np.eye(4)[:3].reshape(-1)
    lines = ["P0: " + " ".join("0" for _ in range(12))] * 2
    lines.append("P2: " + " ".join(str(x) for x in P2))
    lines.append("P3: " + " ".join("0" for _ in range(12)))
    lines.append("Tr: " + " ".join(str(x) for x in Tr))
    (seqdir / "calib.txt").write_text("\n".join(lines) + "\n")
    (seqdir / "times.txt").write_text("".join(f"{0.1 * i}\n" for i in range(n_frames)))
    (root / "poses").mkdir()
    pose_lines = []
    for i in range(n_frames):
        p = np.eye(4)
        p[0, 3] = i * 1.0
        pose_lines.append(" ".join(str(x) for x in p[:3].reshape(-1)))
    (root / "poses" / f"{seq:02d}.txt").write_text("\n".join(pose_lines) + "\n")


def test_kitti_odometry_loader(tmp_path):
    from vfmreg_tpu.data.kitti_odometry import KittiOdometry

    _make_kitti_tree(tmp_path)
    ds = KittiOdometry(0, tmp_path)
    assert len(ds) == 3
    pcl = ds.read_pcl(0)
    assert pcl.shape[1] == 3 and pcl.shape[0] == 500
    poses = ds.gt_poses
    assert len(poses) == 3
    np.testing.assert_allclose(poses[1][0, 3], 1.0, atol=1e-9)  # identity Tr
    img = ds.read_images(0)["camera"]
    assert img.shape == (32, 64, 3)
    # Projection: points ahead of the camera land in-bounds.
    pts_h = np.r_[np.array([[0.1, 0.0, 5.0]]).T, [[1.0]]]
    u, v, idx = ds.project_pcl_to_image(pts_h, img, "camera")
    assert idx.size == 1 and 0 <= u[0] <= 64 and 0 <= v[0] <= 32


def test_kiss_kitti_dataset(tmp_path):
    from vfmreg_tpu.kiss.datasets import dataset_factory

    _make_kitti_tree(tmp_path)
    ds = dataset_factory("kitti", tmp_path, 0)
    assert len(ds) == 3
    out = ds[0]
    frame = out[0] if isinstance(out, tuple) else out
    assert frame.shape[1] == 3
    assert hasattr(ds, "gt_poses")
    assert len(ds.gt_poses) == 3 and ds.gt_poses[0].shape == (4, 4)


def test_generic_dataset_ply(tmp_path):
    from vfmreg_tpu.kiss.datasets import GenericDataset

    ply = tmp_path / "000000.ply"
    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], dtype=np.float32)
    header = (
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    body = "\n".join(" ".join(str(v) for v in p) for p in pts)
    ply.write_text(header + body + "\n")
    ds = GenericDataset(tmp_path)
    got = ds[0]
    frame = got[0] if isinstance(got, tuple) else got
    np.testing.assert_allclose(np.asarray(frame)[:, :3], pts, atol=1e-6)


@pytest.mark.slow
def test_radius_knn_matches_bruteforce(rng):
    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.ops.knn import radius_knn

    pts = rng.uniform(-5, 5, (400, 3)).astype(np.float32)
    grid = build_hash_grid(jnp.asarray(pts), 1.0, max_points_per_voxel=32)
    q = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
    k, radius = 8, 0.9
    out = radius_knn(grid, jnp.asarray(q), jnp.ones(50, dtype=bool), k=k, radius=radius)

    stored = np.asarray(grid.points)
    valid = np.asarray(grid.valid)
    for i in range(50):
        d = np.linalg.norm(stored - q[i], axis=1)
        d[~valid] = np.inf
        in_ball = np.sort(d[d < radius])[:k]
        got = np.sort(np.asarray(out.dist[i])[np.asarray(out.mask[i])])
        np.testing.assert_allclose(got, in_ball, atol=1e-5)


def test_radius_knn_exclude_self(rng):
    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.ops.knn import radius_knn

    pts = rng.uniform(-3, 3, (100, 3)).astype(np.float32)
    grid = build_hash_grid(jnp.asarray(pts), 1.0, max_points_per_voxel=32)
    # Query the grid's own stored points: self hits must be dropped.
    out = radius_knn(
        grid, grid.points, grid.valid, k=4, radius=0.8, exclude_self=True
    )
    d = np.asarray(out.dist)[np.asarray(out.mask)]
    assert (d > 1e-8).all()


def test_print_msg_runs(capsys):
    from vfmreg_tpu.utils.logging import print_msg

    pose = np.eye(4)
    pose[:3, 3] = [1.0, -2.0, 3.0]
    print_msg(pose, title="test_pose", color="green")
    out = capsys.readouterr().out
    assert "test_pose" in out and "1.00" in out


def _make_robotcar_tree(root):
    """Fabricate a minimal radar-oxford-10k sequence + SDK models/extrinsics."""
    seq = "2019-01-10-11-46-21"
    seqdir = root / f"{seq}-radar-oxford-10k"
    rng = np.random.RandomState(0)

    # --- SDK camera models: identity LUT + simple pinhole ---------------------
    models = root / "models"
    models.mkdir(parents=True)
    cam_sizes = {
        "stereo_narrow_left": (160, 32),  # (H, W); stereo crop removes 150 rows
        "mono_left": (210, 32),
        "mono_right": (210, 32),
        "mono_rear": (210, 32),
    }
    for name, (h, w) in cam_sizes.items():
        (models / f"{name}.txt").write_text(
            "20.0 20.0 16.0 5.0\n"
            + "\n".join(" ".join(str(float(i == j)) for j in range(4)) for i in range(4))
            + "\n"
        )
        u = np.tile(np.arange(w, dtype=np.float64), h)
        v = np.repeat(np.arange(h, dtype=np.float64), w)
        np.concatenate([u, v]).astype(np.float64).tofile(models / f"{name}_distortion_lut.bin")

    extr = root / "extrinsics"
    extr.mkdir()
    for name in ["velodyne_left", "stereo", "mono_left", "mono_right", "mono_rear", "ins"]:
        (extr / f"{name}.txt").write_text("0 0 0 0 0 0\n")

    # --- timestamps + raw Bayer images + lidar bins ---------------------------
    n_raw = 8  # step=2 -> 4 lidar frames
    ts0 = 1_500_000_000_000_000
    pcl_ts = [ts0 + 100_000 * i for i in range(n_raw)]
    (seqdir / "velodyne_left").mkdir(parents=True)
    (seqdir / "gps").mkdir()
    (seqdir / "velodyne_left.timestamps").write_text(
        "".join(f"{t} 1\n" for t in pcl_ts)
    )
    from PIL import Image

    for cam, folder, (h, w) in [
        ("stereo", "stereo/centre", cam_sizes["stereo_narrow_left"]),
        ("mono_left", "mono_left", cam_sizes["mono_left"]),
        ("mono_right", "mono_right", cam_sizes["mono_right"]),
        ("mono_rear", "mono_rear", cam_sizes["mono_rear"]),
    ]:
        (seqdir / folder).mkdir(parents=True, exist_ok=True)
        (seqdir / f"{cam}.timestamps").write_text(
            "".join(f"{t + 7} 1\n" for t in pcl_ts)
        )
        for t in pcl_ts:
            raw = rng.randint(0, 255, (h, w), dtype=np.uint8)
            Image.fromarray(raw, mode="L").save(seqdir / folder / f"{t + 7}.png")

    for t in pcl_ts:
        n = 300
        pts = np.r_[
            rng.uniform(-40, 40, (3, n)),  # includes close + far points
            np.ones((1, n)),
        ].astype(np.float32)
        pts.tofile(seqdir / "velodyne_left" / f"{t}.bin")

    # --- INS csv: header + rows bracketing all pcl timestamps -----------------
    rows = ["timestamp,a,b,c,d,northing,easting,down,e,f,g,h,i,roll,pitch,yaw"]
    for i, t in enumerate([ts0 - 200_000] + pcl_ts + [pcl_ts[-1] + 200_000]):
        x = 0.1 * i
        rows.append(f"{t},0,0,0,0,{x},{2 * x},0.0,0,0,0,0,0,0.0,0.0,0.01")
    (seqdir / "gps" / "ins.csv").write_text("\n".join(rows) + "\n")
    return seq


def test_oxford_robotcar_loader(tmp_path):
    from vfmreg_tpu.data.oxford_robotcar import OxfordRobotcar

    seq = _make_robotcar_tree(tmp_path)
    ds = OxfordRobotcar(seq, tmp_path, models_dir=tmp_path / "models",
                        extrinsics_dir=tmp_path / "extrinsics")
    assert len(ds) == 4  # 8 raw timestamps at step 2

    # Ego removal + 50 m crop.
    pcl = ds.read_pcl(0)
    d = np.linalg.norm(pcl, axis=1)
    assert (d > 2.5).all() and (d < 50).all() and pcl.shape[1] == 3

    # Demosaic -> identity-LUT undistort -> crop; PNG cache materializes.
    imgs = ds.read_images(0)
    assert imgs["stereo/centre"].shape == (10, 32, 3)  # 160 - 150 hood crop
    assert imgs["mono_left"].shape == (10, 32, 3)  # 210 - 200 crop
    assert ds.img_undistorted_files["stereo/centre"][0].exists()
    imgs2 = ds.read_images(0)  # cache hit
    np.testing.assert_array_equal(imgs2["stereo/centre"], imgs["stereo/centre"])

    # Poses: origin-relative, so pose[0] == I; later poses move.
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-9)
    assert np.linalg.norm(ds.gt_poses[-1][:3, 3]) > 0.1

    # Projection: a point on the optical axis ahead of the camera must land
    # in-bounds near the principal point with its index preserved.
    pcl_h = np.array([[0.0, 0.1, 5.0, 1.0]]).T
    img = imgs["stereo/centre"]
    u, v, idx = ds.project_pcl_to_image(pcl_h, img, "stereo/centre")
    assert idx.size == 1 and int(idx[0]) == 0, (u, v, idx)
    assert 0 <= float(u[0]) < img.shape[1] and 0 <= float(v[0]) < img.shape[0]
    # Timestamp sync cache written.
    assert (tmp_path / f"{seq}-radar-oxford-10k" / "stereo_2.timestamps").exists()
