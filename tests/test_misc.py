"""Scene specs, profiling, transform service, MaskCLIP, download converters."""

import numpy as np
import pytest

from vfmreg_tpu.data.scene import (
    load_scene_spec,
    make_scene_spec,
    update_release_gt_pose,
    write_scene_spec,
)


def test_scene_spec_roundtrip(tmp_path):
    spec = make_scene_spec(
        ["a.bin", "b.bin"],
        [["a1.png"], ["b1.png"]],
        [np.eye(4), np.eye(4)],
        ["c.bin"],
        [["c1.png"]],
        [np.eye(4)],
    )
    path = tmp_path / "scene_000.json"
    write_scene_spec(path, spec)
    loaded = load_scene_spec(path)
    assert loaded["mapping"]["point_clouds"] == ["a.bin", "b.bin"]

    T = np.eye(4)
    T[0, 3] = 5.0
    update_release_gt_pose(path, 0, T)
    loaded = load_scene_spec(path)
    assert loaded["registration"][0]["pose"][0][3] == 5.0


def test_scene_spec_validation(tmp_path):
    with pytest.raises(ValueError):
        make_scene_spec(["a"], [["i"], ["j"]], [np.eye(4)], [], [], [])


def test_timer_report():
    from vfmreg_tpu.utils.profiling import Timer

    t = Timer()
    with t.span("work"):
        pass
    with t.span("work"):
        pass
    rep = t.report()
    assert "work" in rep and "x2" in rep


def test_transform_service_roundtrip(rng):
    from vfmreg_tpu.pipeline.transform_server import (
        TransformServer,
        compute_transform,
        request_transform,
    )

    pts = np.c_[rng.uniform(-20, 20, (2000, 2)), rng.uniform(0, 4, (2000, 1))]
    # add structure
    wall = np.c_[rng.uniform(-20, 20, (500, 1)), np.full((500, 1), 8.0), rng.uniform(0, 4, (500, 1))]
    pts = np.concatenate([pts, wall])
    offset = np.array([0.4, -0.3, 0.1])
    frame_a = pts - offset

    pose = compute_transform(frame_a, pts)
    assert np.linalg.norm(pose[:3, 3] - offset) < 0.1

    with TransformServer() as server:
        pose2 = request_transform(server.host, server.port, frame_a, pts)
    np.testing.assert_allclose(pose2, pose, atol=1e-6)


def test_maskclip_forward_shapes(rng):
    import jax
    import jax.numpy as jnp

    from vfmreg_tpu.models.maskclip import MaskCLIPConfig, init_maskclip_params, maskclip_forward

    cfg = MaskCLIPConfig(hidden_size=64, num_layers=2, num_heads=4, patch_size=16, embed_dim=32, pretrain_img_size=64)
    params = init_maskclip_params(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(rng.normal(size=(2, 64, 80, 3)).astype(np.float32))
    out = maskclip_forward(params, img, cfg)
    assert out["patches"].shape == (2, 4, 5, 32)
    assert out["cls"].shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out["patches"])))


def test_maskclip_feature_generator(rng):
    from vfmreg_tpu.models.image_features import ImageFeatureGenerator
    from vfmreg_tpu.models.maskclip import MaskCLIPConfig

    cfg = MaskCLIPConfig(hidden_size=64, num_layers=2, num_heads=4, patch_size=16, embed_dim=32, pretrain_img_size=64)
    gen = ImageFeatureGenerator("maskclip", config=cfg)
    assert gen.patch_size == 16
    img = (rng.uniform(0, 255, (64, 80, 3))).astype(np.uint8)
    feats = gen.get_image_features(img, upsample=True)
    assert feats.shape == (64, 80, 32)


def test_download_models_registry():
    from vfmreg_tpu.pipeline.download_models import CHECKPOINTS

    assert set(CHECKPOINTS) >= {"fcgf", "dip", "gedi", "gcl", "spinnet", "pointdsc", "dinov2"}
    for name, (filename, url, env) in CHECKPOINTS.items():
        assert env.startswith("VFMREG_")
