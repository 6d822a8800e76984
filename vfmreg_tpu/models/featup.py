"""Guided feature upsampling — the `use_featup=True` path.

The reference's FeatUp hub model wraps the backbone with a stack of learned
Joint Bilateral Upsamplers (`image_features.py:39-51`, `use_featup=True`
applies it; the main pipeline runs `use_featup=False` + bilinear,
`prepare_scenes.py:121`). Here the JBU is implemented as the classical
image-guided joint bilateral upsampler evaluated one-shot at target resolution:

  F_hr(p) = sum_q w_s(p,q) * w_r(I(p), I(q)) * F_lr(q) / normalizer

with a Gaussian spatial kernel over the low-res neighborhood and a Gaussian
range kernel on guidance-image differences. This reproduces FeatUp's edge-aware
sharpening behavior without weights.

The learned path is also here: `jbu_stack_upsample` implements FeatUp's
`jbu_stack` upsampler architecture (4 x2 stages of attention-range JBU + a
residual 1x1 fixup projection); `load_featup_state_dict` maps the hub
checkpoint onto it. `ImageFeatureGenerator(use_featup=True)` picks the learned
stack whenever weights are provided (VFMREG_FEATUP_WEIGHTS) and falls back to
the classical kernel otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("out_h", "out_w", "radius"))
def jbu_upsample(
    feats_lr: jnp.ndarray,  # [h, w, D] low-res features
    guidance: jnp.ndarray,  # [H, W, 3] full-res guidance image in [0, 1]
    out_h: int,
    out_w: int,
    radius: int = 1,
    sigma_spatial: float = 1.0,
    sigma_range: float = 0.15,
) -> jnp.ndarray:
    """Joint bilateral upsample of the patch grid to (out_h, out_w)."""
    h, w, d = feats_lr.shape
    # Low-res guidance: area-average the full-res image onto the feature grid.
    guide_lr = jax.image.resize(guidance, (h, w, 3), method="linear")

    ys = (jnp.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (jnp.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)

    acc = jnp.zeros((out_h, out_w, d))
    norm = jnp.zeros((out_h, out_w, 1))
    inv2ss = 1.0 / (2.0 * sigma_spatial**2)
    inv2sr = 1.0 / (2.0 * sigma_range**2)

    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            qy = jnp.clip(y0 + dy, 0, h - 1)  # [out_h]
            qx = jnp.clip(x0 + dx, 0, w - 1)  # [out_w]
            f = feats_lr[qy][:, qx]  # [out_h, out_w, D]
            g = guide_lr[qy][:, qx]  # [out_h, out_w, 3]
            d_spatial = (qy.astype(jnp.float32) - ys)[:, None] ** 2 + (
                qx.astype(jnp.float32) - xs
            )[None, :] ** 2
            w_s = jnp.exp(-d_spatial * inv2ss)[..., None]
            d_range = jnp.sum((guidance - g) ** 2, axis=-1, keepdims=True)
            w_r = jnp.exp(-d_range * inv2sr)
            wgt = w_s * w_r
            acc = acc + wgt * f
            norm = norm + wgt

    return acc / jnp.maximum(norm, 1e-8)


def upsample_features(
    feats_lr: np.ndarray, image: np.ndarray, radius: int = 1
) -> np.ndarray:
    """Host-facing helper: [h, w, D] + uint8 image [H, W, 3] -> [H, W, D]."""
    H, W = image.shape[:2]
    guide = jnp.asarray(image, dtype=jnp.float32) / 255.0
    out = jbu_upsample(jnp.asarray(feats_lr), guide, H, W, radius=radius)
    return np.asarray(out)


# --------------------------------------------------------------------------
# Learned JBU stack — the architecture behind FeatUp's hub `jbu_stack`
# upsampler (4 x2 stages of attention-range joint bilateral upsampling plus a
# residual 1x1 "fixup" projection). Each stage:
#   * projects the pooled guidance through a 2-layer 1x1-conv MLP (GELU) to a
#     key space, and forms a softmax attention kernel between each pixel's key
#     and its (2r+1)^2 reflect-padded neighborhood, scaled by exp(range_temp);
#   * multiplies by a Gaussian spatial kernel on a [-1, 1]-normalized window
#     with learned sigma, and normalizes;
#   * applies the kernel to the bicubically x2-upsampled features.
# Weights load from the hub checkpoint via `load_featup_state_dict`; random
# init keeps the surface usable without it.
# --------------------------------------------------------------------------

_JBU_RADIUS = 3
_JBU_KEY_DIM = 32


def init_jbu_stack_params(key, feat_dim: int, guidance_dim: int = 3):
    keys = jax.random.split(key, 9)
    stages = []
    for i in range(4):
        k1, k2 = keys[2 * i], keys[2 * i + 1]
        stages.append(
            {
                "range_temp": jnp.zeros(()),
                "sigma_spatial": jnp.ones(()),
                "proj1_w": jax.random.normal(k1, (guidance_dim, _JBU_KEY_DIM)) * 0.2,
                "proj1_b": jnp.zeros((_JBU_KEY_DIM,)),
                "proj2_w": jax.random.normal(k2, (_JBU_KEY_DIM, _JBU_KEY_DIM)) * 0.2,
                "proj2_b": jnp.zeros((_JBU_KEY_DIM,)),
            }
        )
    fixup_w = jax.random.normal(keys[8], (feat_dim, feat_dim)) * 0.02
    return {"stages": stages, "fixup_w": fixup_w, "fixup_b": jnp.zeros((feat_dim,))}


def load_featup_state_dict(sd) -> dict:
    """Map a FeatUp hub `jbu_stack` upsampler state dict (numpy values) to our
    pytree. Accepts keys with or without an `upsampler.` prefix."""
    sd = {k.replace("upsampler.", ""): np.asarray(v) for k, v in sd.items()}
    stages = []
    for i in range(1, 5):
        p = f"up{i}."
        stages.append(
            {
                "range_temp": jnp.asarray(sd[p + "range_temp"]).reshape(()),
                "sigma_spatial": jnp.asarray(sd[p + "sigma_spatial"]).reshape(()),
                # torch Conv2d 1x1 weight [out, in, 1, 1] -> [in, out] matmul
                "proj1_w": jnp.asarray(sd[p + "range_proj.0.weight"])[:, :, 0, 0].T,
                "proj1_b": jnp.asarray(sd[p + "range_proj.0.bias"]),
                "proj2_w": jnp.asarray(sd[p + "range_proj.3.weight"])[:, :, 0, 0].T,
                "proj2_b": jnp.asarray(sd[p + "range_proj.3.bias"]),
            }
        )
    return {
        "stages": stages,
        "fixup_w": jnp.asarray(sd["fixup_proj.1.weight"])[:, :, 0, 0].T,
        "fixup_b": jnp.asarray(sd["fixup_proj.1.bias"]),
    }


def _reflect_pad2d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return jnp.pad(x, ((r, r), (r, r), (0, 0)), mode="reflect")


def _bicubic_x2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact torch `Upsample(mode="bicubic", align_corners=False)` x2."""
    from vfmreg_tpu.models.vit import _torch_bicubic_matrix

    h, w, _ = x.shape
    wh = _torch_bicubic_matrix(h, 2 * h)
    ww = _torch_bicubic_matrix(w, 2 * w)
    return jnp.einsum("wj,hjd->hwd", ww, jnp.einsum("hi,ijd->hjd", wh, x))


def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] averaging weights of torch `adaptive_avg_pool1d` bins
    (bin i spans [floor(i*n/o), ceil((i+1)*n/o))). Realizing the pool as two
    matmuls keeps the traced graph O(1) in output size (a Python loop of
    per-bin slices emits tens of thousands of HLO ops at stage-4 sizes)."""
    mat = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        s = (i * n_in) // n_out
        e = -(-((i + 1) * n_in) // n_out)
        mat[i, s:e] = 1.0 / (e - s)
    return mat


def _adaptive_avg_pool(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """torch `F.adaptive_avg_pool2d` on [H, W, C] (variable-size bins)."""
    H, W, _ = x.shape
    rh = jnp.asarray(_adaptive_pool_matrix(H, oh))
    rw = jnp.asarray(_adaptive_pool_matrix(W, ow))
    return jnp.einsum("wj,hjd->hwd", rw, jnp.einsum("hi,ijd->hjd", rh, x))


def jbu_learned_one(stage: dict, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
    """One learned-JBU x2 stage: [h, w, D] + [2h, 2w, G] -> [2h, 2w, D]."""
    r, dia = _JBU_RADIUS, 2 * _JBU_RADIUS + 1
    gh, gw, _ = guidance.shape

    proj = jax.nn.gelu(guidance @ stage["proj1_w"] + stage["proj1_b"])
    proj = proj @ stage["proj2_w"] + stage["proj2_b"]  # [2h, 2w, K]
    proj_pad = _reflect_pad2d(proj, r)
    temp = jnp.minimum(jnp.exp(stage["range_temp"]), 1e4)

    hr = _bicubic_x2(source)
    hr_pad = _reflect_pad2d(hr, r)

    # Attention logits against each of the dia^2 neighbors, streamed as shifted
    # slices (never materializes the [2h, 2w, 49, K] unfold).
    logits = []
    for dy in range(dia):
        for dx in range(dia):
            nb = jax.lax.dynamic_slice(proj_pad, (dy, dx, 0), (gh, gw, proj.shape[-1]))
            logits.append(jnp.sum(proj * nb, axis=-1))
    logits = jnp.stack(logits, axis=-1) * temp  # [2h, 2w, dia^2]
    range_kernel = jax.nn.softmax(logits, axis=-1)

    lin = jnp.linspace(-1.0, 1.0, dia)
    d2 = lin[:, None] ** 2 + lin[None, :] ** 2
    spatial = jnp.exp(-d2.reshape(-1) / (2.0 * stage["sigma_spatial"] ** 2))

    kernel = range_kernel * spatial[None, None, :]
    kernel = kernel / jnp.maximum(jnp.sum(kernel, axis=-1, keepdims=True), 1e-7)

    out = jnp.zeros_like(hr)
    k = 0
    for dy in range(dia):
        for dx in range(dia):
            nb = jax.lax.dynamic_slice(hr_pad, (dy, dx, 0), (gh, gw, hr.shape[-1]))
            out = out + kernel[..., k : k + 1] * nb
            k += 1
    return out


@jax.jit
def jbu_stack_upsample(params: dict, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
    """FeatUp JBU stack: [h, w, D] features + [H, W, 3] image -> [16h, 16w, D]."""
    x = source
    for stage in params["stages"]:
        h, w, _ = x.shape
        g = _adaptive_avg_pool(guidance, 2 * h, 2 * w)
        x = jbu_learned_one(stage, x, g)
    return (x @ params["fixup_w"] + params["fixup_b"]) * 0.1 + x
