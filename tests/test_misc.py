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


@pytest.mark.slow
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


def test_jbu_upsample_edge_aware(rng):
    """JBU preserves a guidance edge that plain bilinear blurs."""
    import jax.numpy as jnp

    from vfmreg_tpu.models.featup import jbu_upsample

    # Low-res features: left half 0, right half 1; guidance has a sharp edge.
    feats = np.zeros((8, 8, 4), dtype=np.float32)
    feats[:, 4:] = 1.0
    guide = np.zeros((64, 64, 3), dtype=np.float32)
    guide[:, 32:] = 1.0
    up = np.asarray(jbu_upsample(jnp.asarray(feats), jnp.asarray(guide), 64, 64))
    assert up.shape == (64, 64, 4)
    # Pixels adjacent to the edge stay close to their side's value.
    assert up[32, 30, 0] < 0.15
    assert up[32, 34, 0] > 0.85


@pytest.mark.slow
def test_featup_path_in_generator(rng):
    from tests_vit_config import SMALL_VIT

    from vfmreg_tpu.models.image_features import ImageFeatureGenerator

    gen = ImageFeatureGenerator("dinov2", use_featup=True, config=SMALL_VIT, seed=0)
    img = (rng.uniform(0, 255, (56, 70, 3))).astype(np.uint8)
    feats = gen.get_image_features(img, upsample=True)
    assert feats.shape == (56, 70, SMALL_VIT.hidden_size)
    assert np.all(np.isfinite(feats))


def test_model_registry():
    from vfmreg_tpu.models.sparse_resunet import load_model

    cfg = load_model("ResUNetFatBN")
    assert cfg.tr_channels == (128, 128, 128, 256)
    with pytest.raises(ValueError):
        load_model("NotAModel")


def test_cluster_insertion(tmp_path, rng):
    from vfmreg_tpu.pipeline.registration_node import RegistrationNode

    cluster = np.c_[rng.uniform(-1, 1, (200, 3)), rng.normal(size=(200, 8))].astype(np.float32)
    np.save(tmp_path / "000.npy", cluster)
    node = RegistrationNode.__new__(RegistrationNode)
    node.cluster_insertion_dir = tmp_path
    node.cluster_removal_prob = 0.05  # -> 5 insertions
    local_map = np.c_[rng.uniform(-20, 20, (1000, 3)), rng.normal(size=(1000, 8))].astype(np.float32)
    out = node._apply_cluster_insertion(local_map, np.eye(4), np.random.RandomState(0))
    assert out.shape[0] == 1000 + 5 * 200
    assert out.shape[1] == 11


def test_maskclip_parity_vs_transformers(rng):
    """Our CLIP visual tower (standard last layer) matches
    transformers.CLIPVisionModel with the same random weights."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from vfmreg_tpu.models.maskclip import MaskCLIPConfig, load_clip_visual_state_dict, maskclip_forward

    hf_cfg = CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=64,
        patch_size=16,
        projection_dim=32,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    # Convert HF naming -> OpenAI-CLIP "visual." naming our converter reads.
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    conv = {}
    vm = "vision_model."
    conv["conv1.weight"] = sd[vm + "embeddings.patch_embedding.weight"]
    conv["class_embedding"] = sd[vm + "embeddings.class_embedding"]
    conv["positional_embedding"] = sd[vm + "embeddings.position_embedding.weight"]
    conv["ln_pre.weight"] = sd[vm + "pre_layrnorm.weight"]
    conv["ln_pre.bias"] = sd[vm + "pre_layrnorm.bias"]
    conv["ln_post.weight"] = sd[vm + "post_layernorm.weight"]
    conv["ln_post.bias"] = sd[vm + "post_layernorm.bias"]
    conv["proj"] = np.eye(64, dtype=np.float32)  # HF vision model has no proj
    for i in range(2):
        src = f"{vm}encoder.layers.{i}."
        dst = f"transformer.resblocks.{i}."
        conv[dst + "ln_1.weight"] = sd[src + "layer_norm1.weight"]
        conv[dst + "ln_1.bias"] = sd[src + "layer_norm1.bias"]
        conv[dst + "ln_2.weight"] = sd[src + "layer_norm2.weight"]
        conv[dst + "ln_2.bias"] = sd[src + "layer_norm2.bias"]
        conv[dst + "attn.in_proj_weight"] = np.concatenate(
            [sd[src + "self_attn.q_proj.weight"], sd[src + "self_attn.k_proj.weight"], sd[src + "self_attn.v_proj.weight"]]
        )
        conv[dst + "attn.in_proj_bias"] = np.concatenate(
            [sd[src + "self_attn.q_proj.bias"], sd[src + "self_attn.k_proj.bias"], sd[src + "self_attn.v_proj.bias"]]
        )
        conv[dst + "attn.out_proj.weight"] = sd[src + "self_attn.out_proj.weight"]
        conv[dst + "attn.out_proj.bias"] = sd[src + "self_attn.out_proj.bias"]
        conv[dst + "mlp.c_fc.weight"] = sd[src + "mlp.fc1.weight"]
        conv[dst + "mlp.c_fc.bias"] = sd[src + "mlp.fc1.bias"]
        conv[dst + "mlp.c_proj.weight"] = sd[src + "mlp.fc2.weight"]
        conv[dst + "mlp.c_proj.bias"] = sd[src + "mlp.fc2.bias"]

    cfg = MaskCLIPConfig(hidden_size=64, num_layers=2, num_heads=4, patch_size=16, embed_dim=64, pretrain_img_size=64)
    params = load_clip_visual_state_dict(conv, cfg)

    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ours = maskclip_forward(params, jnp.asarray(img), cfg, standard_last_layer=True)
    with torch.no_grad():
        theirs = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    # HF last_hidden_state is pre-ln_post; compare after applying ln_post+proj(I):
    import torch.nn.functional as F
    ln = torch.nn.LayerNorm(64, eps=1e-5)
    ln.weight.data = hf.vision_model.post_layernorm.weight
    ln.bias.data = hf.vision_model.post_layernorm.bias
    with torch.no_grad():
        ref = ln(torch.from_numpy(theirs)).numpy()
    got = np.concatenate(
        [np.asarray(ours["cls"])[:, None, :], np.asarray(ours["patches"]).reshape(1, -1, 64)], axis=1
    )
    np.testing.assert_allclose(got, ref, atol=3e-4)


def test_prefetch_order_and_exceptions():
    from vfmreg_tpu.utils.prefetch import prefetch

    assert list(prefetch(range(100), size=3)) == list(range(100))

    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    assert next(it) == 2
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        next(it)

    # Early consumer stop shuts the worker down without hanging.
    it2 = prefetch(iter(range(10**6)), size=1)
    assert next(it2) == 0
    it2.close()


def test_imports_do_not_initialize_jax_backend():
    """Importing the package surface must not create device arrays: a
    module-level jnp constant initializes the jax backend at import time,
    which hangs every CLI before it can force the CPU platform whenever the
    remote-TPU tunnel is down (observed: kiss CLI stuck despite
    --platform cpu). Runs in a subprocess so this test's own jax state
    doesn't contaminate the check."""
    import subprocess
    import sys

    code = (
        "import vfmreg_tpu, vfmreg_tpu.kiss.pipeline, vfmreg_tpu.kiss.datasets,"
        "vfmreg_tpu.ops.hash_grid, vfmreg_tpu.ops.matching,"
        "vfmreg_tpu.ops.sparse_conv, vfmreg_tpu.ops.voxel,"
        "vfmreg_tpu.registration.icp, vfmreg_tpu.parallel.mesh,"
        "vfmreg_tpu.pipeline.registration_node, vfmreg_tpu.kiss.cli\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, dict(xla_bridge._backends)\n"
        "print('clean')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "clean" in out.stdout


def test_checkpoint_manifest_pins_and_detects_corruption(tmp_path):
    """Integrity manifest (VERDICT r4 item 5): the first verification pins
    each cached file's sha256+size into <cache>/manifest.json; flipping ONE
    byte of the file afterwards fails loudly."""
    import pytest

    from vfmreg_tpu.pipeline.download_models import (
        check_and_pin_manifest,
        file_sha256,
        load_manifest,
    )

    target = tmp_path / "chkpt.pth"
    target.write_bytes(b"\x00" * 1024 + b"payload")
    assert check_and_pin_manifest(tmp_path, "dip", target) == "pinned"
    m = load_manifest(tmp_path)
    assert m["dip"]["sha256"] == file_sha256(target)
    assert check_and_pin_manifest(tmp_path, "dip", target) == "ok"

    raw = bytearray(target.read_bytes())
    raw[512] ^= 0x01  # one-byte corruption, same size
    target.write_bytes(bytes(raw))
    with pytest.raises(RuntimeError, match="integrity FAILURE"):
        check_and_pin_manifest(tmp_path, "dip", target)


def test_checkpoint_shape_manifest_vs_golden():
    """The structural manifest checks a checkpoint's tensor keys/shapes
    against the reference golden: the golden's own state dict passes, and a
    re-shaped or missing tensor fails loudly."""
    import numpy as np
    import pytest

    from vfmreg_tpu.pipeline.download_models import check_state_shapes

    golden = np.load(
        "tests/golden/fcgf_reference_golden.npz", allow_pickle=True
    )
    sd = {k[4:]: golden[k] for k in golden.files if k.startswith("sd::")}
    n = check_state_shapes("fcgf", {"state_dict": sd})
    assert n > 50  # every golden tensor checked

    bad = dict(sd)
    key = next(iter(k for k in bad if bad[k].ndim >= 1))
    bad[key] = bad[key][..., :1]
    with pytest.raises(RuntimeError, match="structure FAILURE"):
        check_state_shapes("fcgf", {"state_dict": bad})

    missing = dict(sd)
    missing.pop(key)
    with pytest.raises(RuntimeError, match="missing tensor"):
        check_state_shapes("fcgf", {"state_dict": missing})


def test_manifest_status_prints(tmp_path, capsys):
    from vfmreg_tpu.pipeline.download_models import (
        CHECKPOINTS,
        check_and_pin_manifest,
        manifest_status,
    )

    fn = CHECKPOINTS["spinnet"][0]
    (tmp_path / fn).write_bytes(b"stub")
    manifest_status(tmp_path)
    out = capsys.readouterr().out
    assert "UNPINNED" in out and "absent" in out
    check_and_pin_manifest(tmp_path, "spinnet", tmp_path / fn)
    manifest_status(tmp_path)
    assert "pinned OK" in capsys.readouterr().out
