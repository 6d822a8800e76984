"""Guided feature upsampling — the `use_featup=True` path.

The reference's FeatUp hub model wraps the backbone with a stack of learned
Joint Bilateral Upsamplers (`image_features.py:39-51`, `use_featup=True`
applies it; the main pipeline runs `use_featup=False` + bilinear,
`prepare_scenes.py:121`). Here the JBU is implemented as the classical
image-guided joint bilateral upsampler evaluated one-shot at target resolution:

  F_hr(p) = sum_q w_s(p,q) * w_r(I(p), I(q)) * F_lr(q) / normalizer

with a Gaussian spatial kernel over the low-res neighborhood and a Gaussian
range kernel on guidance-image differences. This reproduces FeatUp's edge-aware
sharpening behavior without its learned per-stage kernels; converted FeatUp
weights can replace the kernels later without changing the call surface.
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
