"""MaskCLIP vision-tower parity vs `transformers.CLIPVisionModelWithProjection`
with random weights (no downloads) — same recipe as `tests/test_vit.py`.

Covers the plain CLIP tower (reference consumer: FeatUp "maskclip" wraps CLIP
ViT-B/16, `image_features.py:44-51`, patch 16, 512-d), the pos-embed
interpolation path for non-224 inputs, and the MaskCLIP value-only last-layer
modification pinned against a torch oracle built from the same module weights.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vfmreg_tpu.models.maskclip import (
    MaskCLIPConfig,
    load_clip_visual_state_dict,
    maskclip_forward,
)

SMALL = MaskCLIPConfig(
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    patch_size=16,
    embed_dim=32,
    pretrain_img_size=64,  # 4x4 pos grid
)


def _torch_small_model():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=SMALL.hidden_size,
        num_hidden_layers=SMALL.num_layers,
        num_attention_heads=SMALL.num_heads,
        intermediate_size=SMALL.hidden_size * 4,
        patch_size=SMALL.patch_size,
        image_size=SMALL.pretrain_img_size,
        projection_dim=SMALL.embed_dim,
        hidden_act="quick_gelu",  # OpenAI CLIP activation
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    return CLIPVisionModelWithProjection(cfg).eval()


def _to_openai_sd(model):
    """transformers CLIPVision state dict -> OpenAI `visual.` naming, so the
    production converter (`load_clip_visual_state_dict`) is what gets tested."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    out = {
        "conv1.weight": sd["vision_model.embeddings.patch_embedding.weight"],
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "positional_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "ln_pre.weight": sd["vision_model.pre_layrnorm.weight"],
        "ln_pre.bias": sd["vision_model.pre_layrnorm.bias"],
        "ln_post.weight": sd["vision_model.post_layernorm.weight"],
        "ln_post.bias": sd["vision_model.post_layernorm.bias"],
        "proj": sd["visual_projection.weight"].T,
    }
    for i in range(SMALL.num_layers):
        src = f"vision_model.encoder.layers.{i}."
        dst = f"transformer.resblocks.{i}."
        out[dst + "attn.in_proj_weight"] = np.concatenate(
            [sd[src + f"self_attn.{n}_proj.weight"] for n in ("q", "k", "v")]
        )
        out[dst + "attn.in_proj_bias"] = np.concatenate(
            [sd[src + f"self_attn.{n}_proj.bias"] for n in ("q", "k", "v")]
        )
        out[dst + "attn.out_proj.weight"] = sd[src + "self_attn.out_proj.weight"]
        out[dst + "attn.out_proj.bias"] = sd[src + "self_attn.out_proj.bias"]
        out[dst + "ln_1.weight"] = sd[src + "layer_norm1.weight"]
        out[dst + "ln_1.bias"] = sd[src + "layer_norm1.bias"]
        out[dst + "ln_2.weight"] = sd[src + "layer_norm2.weight"]
        out[dst + "ln_2.bias"] = sd[src + "layer_norm2.bias"]
        out[dst + "mlp.c_fc.weight"] = sd[src + "mlp.fc1.weight"]
        out[dst + "mlp.c_fc.bias"] = sd[src + "mlp.fc1.bias"]
        out[dst + "mlp.c_proj.weight"] = sd[src + "mlp.fc2.weight"]
        out[dst + "mlp.c_proj.bias"] = sd[src + "mlp.fc2.bias"]
    return out


def _torch_projected_tokens(model, img_nchw, **kw):
    """torch-side equivalent of our output: proj(ln_post(tokens)) for ALL
    tokens (the MaskCLIP dense-feature convention)."""
    import torch

    with torch.no_grad():
        hidden = model.vision_model(
            torch.from_numpy(img_nchw), **kw
        ).last_hidden_state
        toks = model.vision_model.post_layernorm(hidden)
        return model.visual_projection(toks).numpy()


def test_maskclip_tower_matches_transformers_same_grid(rng):
    pytest.importorskip("torch")
    model = _torch_small_model()
    params = load_clip_visual_state_dict(_to_openai_sd(model), SMALL)

    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ours = maskclip_forward(params, jnp.asarray(img), SMALL, standard_last_layer=True)
    theirs = _torch_projected_tokens(model, img.transpose(0, 3, 1, 2))

    np.testing.assert_allclose(np.asarray(ours["cls"]), theirs[:, 0], atol=1e-4)
    got = np.asarray(ours["patches"]).reshape(1, -1, SMALL.embed_dim)
    np.testing.assert_allclose(got, theirs[:, 1:], atol=1e-4)


def test_maskclip_tower_matches_transformers_interpolated_grid(rng):
    """6x8 patch grid != 4x4 pretrain grid — the pos-embed bicubic resize path
    (patch 16; transformers `interpolate_pos_encoding=True` on the torch side)."""
    pytest.importorskip("torch")
    model = _torch_small_model()
    params = load_clip_visual_state_dict(_to_openai_sd(model), SMALL)

    img = rng.normal(size=(1, 96, 128, 3)).astype(np.float32)
    ours = maskclip_forward(params, jnp.asarray(img), SMALL, standard_last_layer=True)
    theirs = _torch_projected_tokens(
        model, img.transpose(0, 3, 1, 2), interpolate_pos_encoding=True
    )
    got = np.asarray(ours["patches"]).reshape(1, -1, SMALL.embed_dim)
    np.testing.assert_allclose(got, theirs[:, 1:], atol=1e-4)


def test_maskclip_value_only_last_layer_matches_torch_oracle(rng):
    """The MaskCLIP modification (last layer: y = x + out_proj(v(ln1(x))), no
    softmax mixing) pinned against torch ops over the same module weights."""
    torch = pytest.importorskip("torch")
    model = _torch_small_model()
    params = load_clip_visual_state_dict(_to_openai_sd(model), SMALL)

    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ours = maskclip_forward(params, jnp.asarray(img), SMALL)  # value-only

    with torch.no_grad():
        out = model.vision_model(
            torch.from_numpy(img.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
        x = out.hidden_states[-2]  # input to the LAST encoder layer
        layer = model.vision_model.encoder.layers[-1]
        v = layer.self_attn.v_proj(layer.layer_norm1(x))
        x = x + layer.self_attn.out_proj(v)
        x = x + layer.mlp(layer.layer_norm2(x))
        toks = model.visual_projection(model.vision_model.post_layernorm(x)).numpy()

    got = np.asarray(ours["patches"]).reshape(1, -1, SMALL.embed_dim)
    np.testing.assert_allclose(got, toks[:, 1:], atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["cls"]), toks[:, 0], atol=1e-4)
