"""Sparse ResUNet family (FCGF / GCL backbones) on the gather-based sparse conv.

Covers the reference's MinkowskiEngine models:
  * FCGF `ResUNetBN2C` (`fcgf/fcgf.py:805-808`): CHANNELS [32,64,128,256],
    TR_CHANNELS [64,64,64,128], conv1 kernel 7, forward order
    conv -> norm -> block -> relu (`fcgf.py` ResUNet2.forward);
  * GCL `ResUNetFatBN` (`gcl/model/resunet.py:271-274`): TR_CHANNELS
    [128,128,128,256], conv1 kernel 5, same conv -> norm -> block -> relu
    forward order as FCGF (`resunet.py:165-227`).

A 4-level U-Net over strides 1/2/4/8 with BasicBlockBN residual blocks,
stride-2 down convs, transposed stride-2 up convs emitting onto the skip
level's coordinate set, skip concatenation, 1x1 conv + final 1x1 (bias), and
optional output L2 normalization.

All levels use fixed-shape padded coordinate sets + sorted-hash lookups
(`ops/sparse_conv.py`).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmreg_tpu.ops.sparse_conv import (
    build_coord_lookup,
    downsample_coords,
    kernel_offsets,
    sparse_conv_apply,
)


@dataclasses.dataclass(frozen=True)
class ResUNetConfig:
    in_channels: int = 1
    out_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    tr_channels: Tuple[int, ...] = (64, 64, 64, 128)
    conv1_kernel_size: int = 7
    normalize_feature: bool = True
    relu_before_block: bool = False  # FCGF: False (block then relu); GCL: True


FCGF_CONFIG = ResUNetConfig()
# GCL's ResUNet2.forward follows the SAME conv -> norm -> block -> relu order
# as FCGF (`gcl/model/resunet.py:165-227`, KERNEL_SIZES=[None,3,3,3] so no
# extra dilated layer); it differs only in TR channel widths and conv1 kernel.
GCL_CONFIG = ResUNetConfig(
    tr_channels=(128, 128, 128, 256), conv1_kernel_size=5, normalize_feature=True,
)

# Registry covering the reference model-zoo names (`fcgf/fcgf.py` ResUNet family,
# `gcl/model/__init__.py:27` load_model-by-class-name).
MODEL_REGISTRY = {
    "ResUNetBN2C": FCGF_CONFIG,
    "ResUNetBN2": ResUNetConfig(tr_channels=(32, 64, 64, 128)),
    "ResUNetBN2B": ResUNetConfig(channels=(32, 64, 128, 256), tr_channels=(64, 64, 64, 64)),
    "ResUNetBN2D": ResUNetConfig(tr_channels=(64, 64, 128, 128)),
    "ResUNetBN2E": ResUNetConfig(tr_channels=(128, 128, 128, 128)),
    "ResUNetFatBN": GCL_CONFIG,
}


def load_model(name: str) -> ResUNetConfig:
    """GCL-style registry lookup (`gcl/model/__init__.py:27`)."""
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model '{name}'; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]


def _conv_init(key, k, c_in, c_out):
    n = k**3
    return jax.random.normal(key, (n, c_in, c_out)) * math.sqrt(2.0 / (n * c_in))


def _bn_init(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)), "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _bn(x, p, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["gamma"] + p["beta"]


def init_resunet_params(key: jax.Array, cfg: ResUNetConfig) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 64))
    C = (None,) + cfg.channels
    T = (None,) + cfg.tr_channels

    def block(c):
        return {
            "conv1": _conv_init(next(ks), 3, c, c), "bn1": _bn_init(c),
            "conv2": _conv_init(next(ks), 3, c, c), "bn2": _bn_init(c),
        }

    p: Dict[str, Any] = {
        "conv1": _conv_init(next(ks), cfg.conv1_kernel_size, cfg.in_channels, C[1]),
        "norm1": _bn_init(C[1]),
        "block1": block(C[1]),
    }
    for i in (2, 3, 4):
        p[f"conv{i}"] = _conv_init(next(ks), 3, C[i - 1], C[i])
        p[f"norm{i}"] = _bn_init(C[i])
        p[f"block{i}"] = block(C[i])
    p["conv4_tr"] = _conv_init(next(ks), 3, C[4], T[4])
    p["norm4_tr"] = _bn_init(T[4])
    p["block4_tr"] = block(T[4])
    p["conv3_tr"] = _conv_init(next(ks), 3, C[3] + T[4], T[3])
    p["norm3_tr"] = _bn_init(T[3])
    p["block3_tr"] = block(T[3])
    p["conv2_tr"] = _conv_init(next(ks), 3, C[2] + T[3], T[2])
    p["norm2_tr"] = _bn_init(T[2])
    p["block2_tr"] = block(T[2])
    p["conv1_tr"] = _conv_init(next(ks), 1, C[1] + T[2], T[1])
    p["final"] = {"w": _conv_init(next(ks), 1, T[1], cfg.out_channels), "b": jnp.zeros((cfg.out_channels,))}
    return p


def _apply_block(feats, coords, lookup, mask, bp, offs):
    """BasicBlockBN (`fcgf.py:101-151`): conv-bn-relu-conv-bn + residual, relu."""
    h = sparse_conv_apply(feats, coords, lookup, mask, coords, mask, bp["conv1"], offs)
    h = jax.nn.relu(_bn(h, bp["bn1"]))
    h = sparse_conv_apply(h, coords, lookup, mask, coords, mask, bp["conv2"], offs)
    h = _bn(h, bp["bn2"])
    return jax.nn.relu(h + feats)


@partial(jax.jit, static_argnames=("cfg",))
def resunet_forward(
    params: Dict[str, Any],
    coords: jnp.ndarray,  # [N, 3] int32 quantized coordinates (stride 1)
    feats: jnp.ndarray,  # [N, C_in]
    mask: jnp.ndarray,
    cfg: ResUNetConfig,
) -> jnp.ndarray:
    """Returns [N, out_channels] features at the input coordinates."""
    offs1 = {k: jnp.asarray(kernel_offsets(k, 1)) for k in (1, 3, cfg.conv1_kernel_size)}

    # Level coordinate sets + lookups (strides 1, 2, 4, 8).
    levels = [(coords, mask, build_coord_lookup(coords, mask))]
    stride = 1
    for _ in range(3):
        c, m = downsample_coords(levels[-1][0], levels[-1][1], stride)
        stride *= 2
        levels.append((c, m, build_coord_lookup(c, m)))

    def enc(i, feats_in, lvl_in, lvl_out, stride_units):
        """conv{i} stride-2 (or conv1 stride-1) -> norm -> block/relu per cfg."""
        c_in, m_in, lk_in = lvl_in
        c_out, m_out, lk_out = lvl_out
        if i == 1:
            offs = offs1[cfg.conv1_kernel_size]
        else:
            offs = jnp.asarray(kernel_offsets(3, stride_units))
        h = sparse_conv_apply(feats_in, c_in, lk_in, m_in, c_out, m_out, params[f"conv{i}"], offs)
        h = _bn(h, params[f"norm{i}"])
        boffs = jnp.asarray(kernel_offsets(3, stride_units * (2 if i > 1 else 1)))
        if cfg.relu_before_block:
            h = jax.nn.relu(h)
            h = _apply_block(h, c_out, lk_out, m_out, params[f"block{i}"], boffs)
            return h, h
        h = _apply_block(h, c_out, lk_out, m_out, params[f"block{i}"], boffs)
        return h, jax.nn.relu(h)

    s1, out = enc(1, feats.astype(jnp.float32), levels[0], levels[0], 1)
    s2, out = enc(2, out, levels[0], levels[1], 1)
    s4, out = enc(3, out, levels[1], levels[2], 2)
    s8, out = enc(4, out, levels[2], levels[3], 4)

    def dec(i, feats_in, lvl_in, lvl_out, stride_units):
        """conv{i}_tr stride-2 up: emit onto the skip level's coords."""
        c_in, m_in, lk_in = lvl_in
        c_out, m_out, _ = lvl_out
        # Transposed connectivity: x = y - o, so negate the offsets (in units of
        # the OUTPUT stride).
        offs = -jnp.asarray(kernel_offsets(3, stride_units))
        h = sparse_conv_apply(feats_in, c_in, lk_in, m_in, c_out, m_out, params[f"conv{i}_tr"], offs)
        h = _bn(h, params[f"norm{i}_tr"])
        lk_out = lvl_out[2]
        boffs = jnp.asarray(kernel_offsets(3, stride_units))
        if cfg.relu_before_block:
            h = jax.nn.relu(h)
            h = _apply_block(h, c_out, lk_out, m_out, params[f"block{i}_tr"], boffs)
            return h
        h = _apply_block(h, c_out, lk_out, m_out, params[f"block{i}_tr"], boffs)
        return jax.nn.relu(h)

    # FCGF concatenates the PRE-relu skip tensors (`out_s4` is saved before the
    # relu); GCL's skips are the block outputs directly — both are `s*` here.
    out = dec(4, out, levels[3], levels[2], 4)
    out = jnp.concatenate([out, s4], axis=-1)
    out = dec(3, out, levels[2], levels[1], 2)
    out = jnp.concatenate([out, s2], axis=-1)
    out = dec(2, out, levels[1], levels[0], 1)
    out = jnp.concatenate([out, s1], axis=-1)

    c0, m0, lk0 = levels[0]
    out = sparse_conv_apply(out, c0, lk0, m0, c0, m0, params["conv1_tr"], offs1[1])
    out = jax.nn.relu(out)
    out = sparse_conv_apply(out, c0, lk0, m0, c0, m0, params["final"]["w"], offs1[1])
    out = out + params["final"]["b"]

    if cfg.normalize_feature:
        out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)
    return jnp.where(m0[:, None], out, 0.0)


def load_me_state_dict(state_dict: Dict[str, np.ndarray], cfg: ResUNetConfig) -> Dict[str, Any]:
    """Convert a MinkowskiEngine checkpoint (FCGF `2019-07-31_19-37-00.pth`
    ['state_dict'] / GCL `kitti_chkpt.pth`). ME kernels are [K, C_in, C_out];
    MinkowskiBatchNorm nests stats under `.bn`."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def kern(name):
        w = sd[name + ".kernel"]
        if w.ndim == 2:  # kernel_size 1 convs store [C_in, C_out]
            w = w[None]
        return jnp.asarray(w)

    def bn(name):
        pre = name + ".bn"
        return {
            "gamma": jnp.asarray(sd[pre + ".weight"]),
            "beta": jnp.asarray(sd[pre + ".bias"]),
            "mean": jnp.asarray(sd[pre + ".running_mean"]),
            "var": jnp.asarray(sd[pre + ".running_var"]),
        }

    def block(name):
        return {
            "conv1": kern(name + ".conv1"), "bn1": bn(name + ".norm1"),
            "conv2": kern(name + ".conv2"), "bn2": bn(name + ".norm2"),
        }

    p: Dict[str, Any] = {"conv1": kern("conv1"), "norm1": bn("norm1"), "block1": block("block1")}
    for i in (2, 3, 4):
        p[f"conv{i}"] = kern(f"conv{i}")
        p[f"norm{i}"] = bn(f"norm{i}")
        p[f"block{i}"] = block(f"block{i}")
    for i in (4, 3, 2):
        p[f"conv{i}_tr"] = kern(f"conv{i}_tr")
        p[f"norm{i}_tr"] = bn(f"norm{i}_tr")
        p[f"block{i}_tr"] = block(f"block{i}_tr")
    p["conv1_tr"] = kern("conv1_tr")
    p["final"] = {"w": kern("final"), "b": jnp.asarray(sd["final.bias"])}
    return p
