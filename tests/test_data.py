"""Data layer: SDK math, demosaic, patch sampling parity vs torch, scene prep
on a synthesized NCLT-format mini dataset."""

import json

import numpy as np
import pytest

from vfmreg_tpu.data.robotcar_sdk import (
    build_se3_transform,
    demosaic_bilinear,
    euler_to_so3,
    interpolate_poses,
    so3_to_euler,
    so3_to_quaternion,
)


def test_build_se3_transform_matches_scipy(rng):
    from scipy.spatial.transform import Rotation as R

    for _ in range(10):
        xyzrpy = rng.uniform(-1, 1, 6)
        T = build_se3_transform(xyzrpy)
        # ZYX composition == scipy extrinsic xyz euler
        R_ref = R.from_euler("xyz", xyzrpy[3:]).as_matrix()
        np.testing.assert_allclose(T[:3, :3], R_ref, atol=1e-9)
        np.testing.assert_allclose(T[:3, 3], xyzrpy[:3])


def test_so3_euler_roundtrip(rng):
    for _ in range(10):
        rpy = rng.uniform(-1.2, 1.2, 3)
        R = euler_to_so3(rpy)
        back = so3_to_euler(R)
        np.testing.assert_allclose(back, rpy, atol=1e-6)


def test_so3_to_quaternion(rng):
    from scipy.spatial.transform import Rotation as R

    for _ in range(10):
        Rm = R.random(random_state=rng).as_matrix()
        q = so3_to_quaternion(Rm)  # [w, x, y, z]
        q_ref = R.from_matrix(Rm).as_quat()  # [x, y, z, w]
        ref = np.r_[q_ref[3], q_ref[:3]]
        if np.dot(q, ref) < 0:
            ref = -ref
        np.testing.assert_allclose(q, ref, atol=1e-7)


def test_interpolate_poses_midpoint():
    T0 = build_se3_transform([0, 0, 0, 0, 0, 0])
    T1 = build_se3_transform([2, 0, 0, 0, 0, np.pi / 2])
    out = interpolate_poses([100, 200], [T0, T1], [150], origin_timestamp=100)
    mid = out[0]
    np.testing.assert_allclose(mid[:3, 3], [1, 0, 0], atol=1e-9)
    # Half the rotation: 45 degrees about z
    np.testing.assert_allclose(so3_to_euler(mid[:3, :3]), [0, 0, np.pi / 4], atol=1e-9)


def test_interpolate_poses_origin_relative():
    T0 = build_se3_transform([5, 1, 0, 0, 0, 0.3])
    T1 = build_se3_transform([7, 1, 0, 0, 0, 0.3])
    out = interpolate_poses([100, 200], [T0, T1], [200], origin_timestamp=100)
    # Pose at t=200 relative to pose at t=100
    expected = np.linalg.inv(T0) @ T1
    np.testing.assert_allclose(out[0], expected, atol=1e-9)


def test_demosaic_bilinear_flat_field():
    # A constant-intensity Bayer mosaic demosaics to a constant RGB image.
    raw = np.full((16, 16), 128.0)
    rgb = demosaic_bilinear(raw, "RGGB")
    np.testing.assert_allclose(rgb, 128.0, atol=1e-9)


def test_demosaic_bilinear_pattern_positions():
    # A pure red scene under RGGB: R pixels carry signal, G/B stay near zero.
    raw = np.zeros((8, 8))
    raw[0::2, 0::2] = 200.0  # R positions of RGGB
    rgb = demosaic_bilinear(raw, "RGGB")
    assert rgb[..., 0].mean() > 100.0
    assert rgb[..., 1].mean() < 60.0
    assert rgb[..., 2].mean() < 60.0


def test_sample_patch_features_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import jax.numpy as jnp

    from vfmreg_tpu.ops.projection import sample_patch_features

    h, w, d = 7, 9, 5
    H, W = 77, 99
    feats = rng.normal(size=(h, w, d)).astype(np.float32)
    up = F.interpolate(
        torch.from_numpy(feats.transpose(2, 0, 1))[None],
        (H, W),
        mode="bilinear",
        align_corners=False,
    )[0].numpy().transpose(1, 2, 0)

    u = rng.randint(0, W, 200)
    v = rng.randint(0, H, 200)
    got = np.asarray(
        sample_patch_features(jnp.asarray(feats), jnp.asarray(u), jnp.asarray(v), H, W)
    )
    np.testing.assert_allclose(got, up[v, u], atol=1e-5)


@pytest.fixture
def mini_nclt(tmp_path):
    """Synthesize a minimal NCLT-format dataset (1 camera set, 2 frames)."""
    rng = np.random.RandomState(0)
    root = tmp_path / "nclt"
    seq = "2012-01-08"
    cam_params = root / "cam_params"
    cam_params.mkdir(parents=True)

    H, W = 1232, 1616
    for cam in ("Cam1", "Cam2", "Cam3", "Cam4", "Cam5"):
        # Identity-ish undistortion map (subsampled grid, SDK format).
        with open(cam_params / f"U2D_{cam}_1616X1232.txt", "w") as f:
            f.write(f"{W},{H}\n")
            for r in range(0, H, 8):
                for c in range(0, W, 8):
                    f.write(f"{r} {c} {float(r)} {float(c)}\n")
        cid = cam[-1]
        K = np.array([[400.0, 0, 808], [0, 400.0, 616], [0, 0, 1]])
        np.savetxt(cam_params / f"K_cam{cid}.csv", K, delimiter=",")
        np.savetxt(
            cam_params / f"x_lb3_c{cid}.csv",
            np.r_[rng.uniform(-0.1, 0.1, 3), [0.0, 0.0, 72.0 * int(cid)]],
        )

    ts = [1326030000000000, 1326030001000000]
    img_dirs = {c: root / "images" / seq / "lb3" / c for c in ("Cam1", "Cam2", "Cam3", "Cam4", "Cam5")}
    import cv2

    for c, d in img_dirs.items():
        d.mkdir(parents=True)
        for t in ts:
            img = rng.randint(30, 255, (H, W, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{t}.tiff"), img)

    pcl_dir = root / "velodyne_data" / seq / "velodyne_sync"
    pcl_dir.mkdir(parents=True)
    for t in ts:
        pts = rng.uniform(-30, 30, (500, 3))
        raw = np.round((pts + 100.0) / 0.005).astype(np.int16)
        data = np.zeros((500, 4), dtype=np.int16)
        data[:, :3] = raw
        data.tofile(pcl_dir / f"{t}.bin")

    gt_dir = root / "ground_truth"
    gt_dir.mkdir(parents=True)
    with open(gt_dir / f"groundtruth_{seq}.csv", "w") as f:
        f.write("utime,x,y,z,r,p,h\n")
        for i, t in enumerate([ts[0] - 1000, ts[0] + 500000, ts[1] + 1000]):
            f.write(f"{t},{i * 1.0},0.0,0.0,0.0,0.0,0.0\n")
    return root, seq, ts


def test_nclt_loader(mini_nclt):
    from vfmreg_tpu.data.nclt import NCLT

    root, seq, ts = mini_nclt
    ds = NCLT(seq, root)
    assert len(ds) == 2
    pcl = ds.read_pcl(0)
    assert pcl.shape[1] == 3
    assert np.all(np.linalg.norm(pcl, axis=1) < 50)
    images = ds.read_images(0)
    assert set(images.keys()) == {"Cam1", "Cam2", "Cam3", "Cam4", "Cam5"}
    # Cropped to [820, 700] then rotated 90deg CW -> 700 x 820
    assert images["Cam1"].shape == (700, 820, 3)
    poses = ds.read_poses()
    assert len(poses) == 2
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-9)

    # Projection returns in-bounds pixels referencing real points
    img_proj = np.ones((820, 700, 3), dtype=np.uint8)
    pcl_h = np.insert(pcl, 3, values=1, axis=1).T
    u, v, idx = ds.project_pcl_to_image(pcl_h, img_proj, "Cam1")
    assert len(u) == len(v) == len(idx)
    if len(u):
        assert u.min() >= 0 and u.max() < 700
        assert v.min() >= 0 and v.max() < 820


@pytest.mark.slow
def test_prepare_scene_nclt(mini_nclt, tmp_path):
    from vfmreg_tpu.data.h5io import read_scenes
    from vfmreg_tpu.models.image_features import ImageFeatureGenerator
    from vfmreg_tpu.pipeline.prepare_scenes import prepare_scene
    from tests_vit_config import SMALL_VIT

    root, seq, ts = mini_nclt
    scene = {
        "mapping": {
            "point_clouds": [f"velodyne_data/{seq}/velodyne_sync/{ts[0]}.bin"],
            "images": [
                [f"images/{seq}/lb3/Cam{c}/{ts[0]}.tiff" for c in range(1, 6)]
            ],
            "poses": [np.eye(4).tolist()],
        },
        "registration": [
            {
                "point_cloud": f"velodyne_data/{seq}/velodyne_sync/{ts[1]}.bin",
                "images": [f"images/{seq}/lb3/Cam{c}/{ts[1]}.tiff" for c in range(1, 6)],
                "pose": np.eye(4).tolist(),
            }
        ],
    }
    scene_file = tmp_path / "scene_000.json"
    scene_file.write_text(json.dumps(scene))

    gen = ImageFeatureGenerator("dinov2", config=SMALL_VIT, seed=0)
    out = prepare_scene(root, scene_file, tmp_path / "processed", feature_generator=gen)
    assert out.exists()
    loaded = read_scenes(out)
    assert len(loaded["map_point_clouds"]) == 1
    assert loaded["map_point_clouds"][0].shape[1] == 3 + SMALL_VIT.hidden_size
    # Some points got nonzero descriptors
    desc = loaded["map_point_clouds"][0][:, 3:]
    assert (np.abs(desc).sum(axis=1) > 0).any()


@pytest.mark.slow
def test_prepare_scene_maskclip_512d(mini_nclt, tmp_path):
    """512-d MaskCLIP flow end-to-end: prepare_scenes with the maskclip
    generator (patch 16, embed 512 — `image_features.py:44-51`) -> scene H5 ->
    read-back with 3+512 columns intact."""
    from vfmreg_tpu.data.h5io import read_scenes
    from vfmreg_tpu.models.image_features import ImageFeatureGenerator
    from vfmreg_tpu.models.maskclip import MaskCLIPConfig
    from vfmreg_tpu.pipeline.prepare_scenes import prepare_scene

    root, seq, ts = mini_nclt
    scene = {
        "mapping": {
            "point_clouds": [f"velodyne_data/{seq}/velodyne_sync/{ts[0]}.bin"],
            "images": [
                [f"images/{seq}/lb3/Cam{c}/{ts[0]}.tiff" for c in range(1, 6)]
            ],
            "poses": [np.eye(4).tolist()],
        },
        "registration": [
            {
                "point_cloud": f"velodyne_data/{seq}/velodyne_sync/{ts[1]}.bin",
                "images": [f"images/{seq}/lb3/Cam{c}/{ts[1]}.tiff" for c in range(1, 6)],
                "pose": np.eye(4).tolist(),
            }
        ],
    }
    scene_file = tmp_path / "scene_000.json"
    scene_file.write_text(json.dumps(scene))

    # Tiny tower, production 512-d output head (the plumbing under test).
    cfg = MaskCLIPConfig(
        hidden_size=64, num_layers=2, num_heads=4, patch_size=16,
        embed_dim=512, pretrain_img_size=64,
    )
    gen = ImageFeatureGenerator("maskclip", config=cfg, seed=0)
    assert gen.feature_size == 512 and gen.patch_size == 16
    out = prepare_scene(root, scene_file, tmp_path / "processed", feature_generator=gen)
    assert out.exists()
    loaded = read_scenes(out)
    assert loaded["map_point_clouds"][0].shape[1] == 3 + 512
    assert loaded["scene_point_clouds"][0].shape[1] == 3 + 512
    desc = loaded["map_point_clouds"][0][:, 3:]
    assert (np.abs(desc).sum(axis=1) > 0).any()
