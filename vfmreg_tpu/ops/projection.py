"""Fused patch-feature sampling for point-descriptor projection.

The reference materializes bilinearly-upsampled per-pixel features
(`F.interpolate` to full image resolution — ~760 MB per NCLT camera at 384-d,
`image_features.py:100-104`) and then gathers rows at projected pixel
coordinates in a Python loop (`prepare_scenes.py:85-91`, "hot loop #2").

TPU-first version: sample the ViT patch grid directly at the projected pixel
coordinates with the same align_corners=False bilinear mapping. Mathematically
identical output (both evaluate the same bilinear interpolant at the pixel
center), with O(points * D) gather traffic instead of O(H * W * D) + host loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("img_h", "img_w"))
def sample_patch_features(
    patch_feats: jnp.ndarray,  # [h, w, D]
    u: jnp.ndarray,  # [N] integer pixel column in the upsampled image
    v: jnp.ndarray,  # [N] integer pixel row
    img_h: int,
    img_w: int,
) -> jnp.ndarray:
    """Evaluate bilinear-upsample(patch_feats -> img_h x img_w)[v, u] directly.

    Uses torch's align_corners=False coordinate mapping:
      src = (dst + 0.5) * (src_size / dst_size) - 0.5, edge-clamped.
    """
    h, w, _ = patch_feats.shape
    y = (v.astype(jnp.float32) + 0.5) * (h / img_h) - 0.5
    x = (u.astype(jnp.float32) + 0.5) * (w / img_w) - 0.5
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (y - y0)[:, None]
    wx = (x - x0)[:, None]

    f00 = patch_feats[y0, x0]
    f01 = patch_feats[y0, x1]
    f10 = patch_feats[y1, x0]
    f11 = patch_feats[y1, x1]
    return (
        f00 * (1 - wy) * (1 - wx)
        + f01 * (1 - wy) * wx
        + f10 * wy * (1 - wx)
        + f11 * wy * wx
    )
