"""MaskCLIP dense features — the reference's alternative foundation model
(`image_features.py:44-51`: FeatUp "maskclip", patch 16, 512-d).

CLIP ViT-B/16 visual tower in JAX (pre-LN transformer, quickGELU, bias-free
patch conv, ln_pre/ln_post, 768->512 output projection) with the MaskCLIP
dense-prediction modification (Zhou et al., ECCV 2022): the LAST transformer
layer skips the attention softmax and propagates the value embeddings directly
(y = x + out_proj(v(ln1(x))), then the usual MLP), so every patch token yields
a CLIP-space embedding comparable with text embeddings.

Weight conversion from the OpenAI CLIP "visual." state dict. The text tower is
used only to produce prompt embeddings for `compute_similarity`
(`image_features.py:194-208`); embeddings can be precomputed anywhere CLIP runs
and passed in — this module stays vision-only.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MaskCLIPConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    embed_dim: int = 512  # output projection dim
    pretrain_img_size: int = 224
    layernorm_eps: float = 1e-5

    @property
    def pos_grid(self) -> int:
        return self.pretrain_img_size // self.patch_size


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def init_maskclip_params(key: jax.Array, cfg: MaskCLIPConfig) -> Dict[str, Any]:
    d = cfg.hidden_size
    ks = iter(jax.random.split(key, 8 + cfg.num_layers * 6))

    def dense(n_in, n_out):
        return {
            "w": jax.random.normal(next(ks), (n_in, n_out)) * (1.0 / math.sqrt(n_in)),
            "b": jnp.zeros((n_out,)),
        }

    def ln():
        return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    params: Dict[str, Any] = {
        "patch_embed": jax.random.normal(next(ks), (cfg.patch_size, cfg.patch_size, 3, d)) * 0.02,
        "cls_embed": jax.random.normal(next(ks), (d,)) * 0.02,
        "pos_embed": jax.random.normal(next(ks), (1 + cfg.pos_grid**2, d)) * 0.02,
        "ln_pre": ln(),
        "ln_post": ln(),
        "proj": jax.random.normal(next(ks), (d, cfg.embed_dim)) * (1.0 / math.sqrt(d)),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["blocks"].append(
            {
                "ln1": ln(),
                "qkv": dense(d, 3 * d),
                "out": dense(d, d),
                "ln2": ln(),
                "fc1": dense(d, 4 * d),
                "fc2": dense(4 * d, d),
            }
        )
    return params


def _attention(x, block, cfg: MaskCLIPConfig):
    b, t, d = x.shape
    h = cfg.num_heads
    hd = d // h
    qkv = x @ block["qkv"]["w"] + block["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, hd)
    k = k.reshape(b, t, h, hd)
    v = v.reshape(b, t, h, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
    return out @ block["out"]["w"] + block["out"]["b"]


def _value_only(x, block, cfg: MaskCLIPConfig):
    """MaskCLIP last-layer modification: value path without the softmax mixing."""
    qkv_w = block["qkv"]["w"]
    qkv_b = block["qkv"]["b"]
    d = cfg.hidden_size
    v = x @ qkv_w[:, 2 * d :] + qkv_b[2 * d :]
    return v @ block["out"]["w"] + block["out"]["b"]


def _interp_pos(pos_embed, gh, gw, cfg: MaskCLIPConfig):
    g = cfg.pos_grid
    if gh == g and gw == g:
        return pos_embed
    # Exact torch `F.interpolate(mode="bicubic", align_corners=False)` clone
    # (a=-0.75) realized as two small matmuls — the same resize the torch-side
    # consumers use (transformers `CLIPVisionEmbeddings.interpolate_pos_encoding`).
    from vfmreg_tpu.models.vit import _torch_bicubic_matrix

    cls_pos = pos_embed[:1]
    patch = pos_embed[1:].reshape(g, g, -1)
    wh = _torch_bicubic_matrix(g, gh).astype(patch.dtype)
    ww = _torch_bicubic_matrix(g, gw).astype(patch.dtype)
    patch = jnp.einsum("hH,Hwd->hwd", wh, patch)
    patch = jnp.einsum("wW,hWd->hwd", ww, patch)
    return jnp.concatenate([cls_pos, patch.reshape(gh * gw, -1)], axis=0)


@partial(jax.jit, static_argnames=("cfg", "standard_last_layer"))
def maskclip_forward(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: MaskCLIPConfig,
    standard_last_layer: bool = False,
):
    """[B, H, W, 3] -> dict(cls [B, 512], patches [B, h, w, 512]).

    `standard_last_layer=True` disables the MaskCLIP value-only modification
    (plain CLIP visual tower — used for parity testing against
    transformers.CLIPVisionModel and for cls-token encoding)."""
    b, H, W, _ = images.shape
    p = cfg.patch_size
    gh, gw = H // p, W // p

    x = jax.lax.conv_general_dilated(
        images,
        params["patch_embed"],
        (p, p),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, gh * gw, -1)  # CLIP patch conv has no bias
    cls = jnp.broadcast_to(params["cls_embed"], (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos(params["pos_embed"], gh, gw, cfg)[None]
    x = _ln(x, params["ln_pre"], cfg.layernorm_eps)

    for block in params["blocks"][:-1]:
        x = x + _attention(_ln(x, block["ln1"], cfg.layernorm_eps), block, cfg)
        y = _ln(x, block["ln2"], cfg.layernorm_eps)
        x = x + (_quick_gelu(y @ block["fc1"]["w"] + block["fc1"]["b"]) @ block["fc2"]["w"] + block["fc2"]["b"])

    last = params["blocks"][-1]
    if standard_last_layer:
        x = x + _attention(_ln(x, last["ln1"], cfg.layernorm_eps), last, cfg)
    else:
        x = x + _value_only(_ln(x, last["ln1"], cfg.layernorm_eps), last, cfg)
    y = _ln(x, last["ln2"], cfg.layernorm_eps)
    x = x + (_quick_gelu(y @ last["fc1"]["w"] + last["fc1"]["b"]) @ last["fc2"]["w"] + last["fc2"]["b"])

    x = _ln(x, params["ln_post"], cfg.layernorm_eps)
    x = x @ params["proj"]
    return {"cls": x[:, 0], "patches": x[:, 1:].reshape(b, gh, gw, -1)}


def load_clip_visual_state_dict(state_dict: Dict[str, np.ndarray], cfg: MaskCLIPConfig) -> Dict[str, Any]:
    """Convert an OpenAI CLIP checkpoint's `visual.` subtree."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("visual."):
            sd[k[len("visual."):]] = np.asarray(v)
    if not sd:
        sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def t(w):
        return jnp.asarray(w.T)

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]), "bias": jnp.asarray(sd[prefix + ".bias"])}

    params: Dict[str, Any] = {
        "patch_embed": jnp.asarray(sd["conv1.weight"].transpose(2, 3, 1, 0)),
        "cls_embed": jnp.asarray(sd["class_embedding"]),
        "pos_embed": jnp.asarray(sd["positional_embedding"]),
        "ln_pre": ln("ln_pre"),
        "ln_post": ln("ln_post"),
        "proj": jnp.asarray(sd["proj"]),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        pre = f"transformer.resblocks.{i}."
        params["blocks"].append(
            {
                "ln1": ln(pre + "ln_1"),
                "qkv": {"w": t(sd[pre + "attn.in_proj_weight"]), "b": jnp.asarray(sd[pre + "attn.in_proj_bias"])},
                "out": {"w": t(sd[pre + "attn.out_proj.weight"]), "b": jnp.asarray(sd[pre + "attn.out_proj.bias"])},
                "ln2": ln(pre + "ln_2"),
                "fc1": {"w": t(sd[pre + "mlp.c_fc.weight"]), "b": jnp.asarray(sd[pre + "mlp.c_fc.bias"])},
                "fc2": {"w": t(sd[pre + "mlp.c_proj.weight"]), "b": jnp.asarray(sd[pre + "mlp.c_proj.bias"])},
            }
        )
    return params
