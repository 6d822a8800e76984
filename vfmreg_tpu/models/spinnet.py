"""SpinNet cylindrical-volume descriptor in JAX.

Reimplements `spinnet/{model.py,ThreeDCCN.py,common.py}` (reference #26),
KITTI configuration (`descriptors.py:185-188`): Descriptor_Net(des_r=2.0,
rad_n=9, azi_n=60, ele_n=30, voxel_r=0.3, voxel_sample=30, 'KITTI') — no
z-axis canonicalization for KITTI.

Pipeline per patch (2048 points in a 2 m ball around each keypoint):
  1. spherical partition: S2 grid of ele_n x azi_n directions at rad_n radial
     shells (`get_voxel_coordinate`, `common.py:415-421`);
  2. `sphere_query`: ball query (r=0.3, 30 samples) around each voxel center,
     padding slots replaced by the center so their relative coords vanish
     (`common.py:438-476`);
  3. `var_to_invar`: rotate each azimuth bin by -i * 2pi/azi_n about z
     (`common.py:522-548`) for rotation invariance;
  4. 1x1 point-lift conv (3->16) + max over samples -> [16, rad, ele, azi];
  5. Cylindrical_Net (`ThreeDCCN.py:76-97`): 4 x Conv3d(k3, no D padding) then
     7 dilated Conv2d (dilations 1,2,2,4,4,8,16) with circular azimuth padding
     and zero elevation padding, non-affine BatchNorms, global max pool -> 32-d.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vfmreg_tpu.ops.pointnet2 import ball_query


def s2_grid(n_alpha: int, n_beta: int) -> np.ndarray:
    """(beta, alpha) ring grid (`common.py:279-292`)."""
    beta = np.linspace(0, np.pi, n_beta, endpoint=False) + np.pi / n_beta / 2
    alpha = np.linspace(0, 2 * np.pi, n_alpha, endpoint=False) + np.pi / n_alpha
    B, A = np.meshgrid(beta, alpha, indexing="ij")
    return np.stack((B.flatten(), A.flatten()), axis=1)


def get_voxel_coordinate(radius: float, rad_n: int, azi_n: int, ele_n: int) -> np.ndarray:
    """[rad_n * ele_n * azi_n, 3] cartesian voxel centers (`common.py:415-421`)."""
    grid = s2_grid(n_alpha=azi_n, n_beta=ele_n)
    beta, alpha = grid[:, 0], grid[:, 1]
    xyz = np.stack(
        [np.sin(beta) * np.cos(alpha), np.sin(beta) * np.sin(alpha), np.cos(beta)], axis=-1
    ) * radius
    xyz = np.repeat(xyz[None], rad_n, axis=0)
    scale = (np.arange(rad_n) / rad_n + 1 / (2 * rad_n)).reshape(rad_n, 1, 1)
    return (scale * xyz).reshape(-1, 3)


def _rotz(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def var_to_invar(pts: jnp.ndarray, rad_n: int, azi_n: int, ele_n: int) -> jnp.ndarray:
    """[B, N, k, 3] -> azimuth-aligned coords (`common.py:522-548`)."""
    b, n, k, _ = pts.shape
    pts = pts.reshape(b, rad_n, ele_n, azi_n, k, 3)
    R = np.stack([_rotz(-i * 2 * np.pi / azi_n) for i in range(azi_n)])  # [azi, 3, 3]
    R = jnp.asarray(R, dtype=pts.dtype)
    out = jnp.einsum("breakc,acd->breakd", pts, jnp.swapaxes(R, -1, -2))
    return out.reshape(b, n, k, 3)


def sphere_query_rel(patch_pts, grid_pts, radius, nsample):
    """Relative in-voxel samples; padded slots -> zero (`model.py:53-60` +
    `common.py:438-476`). patch_pts [B, P, 3], grid_pts [N, 3] -> [B, N, k, 3]."""
    b = patch_pts.shape[0]
    centers = jnp.broadcast_to(grid_pts[None], (b,) + grid_pts.shape)
    idx = ball_query(radius, nsample, patch_pts, centers)  # [B, N, k]
    grouped = jax.vmap(lambda p, i: p[i])(patch_pts, idx)
    # Padding slots repeat idx[...,0]; mark them (slot 0 itself is real).
    pad = idx == idx[:, :, 0:1]
    pad = pad.at[:, :, 0].set(False)
    rel = grouped - grid_pts[None, :, None, :]
    return jnp.where(pad[..., None], 0.0, rel)


# ------------------------------------------------------------------ conv net
def _bn_init(c):
    return {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}  # affine=False


def _bn(x, p, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)


_CONV3D_CHANNELS = [32, 32, 64, 64]
_CONV2D_SPECS = [  # (out, k, dilation, bn, relu)
    (128, 3, 1, True, True),
    (128, 3, 2, True, True),
    (64, 3, 2, True, True),
    (64, 3, 4, True, True),
    (32, 2, 4, True, False),
    (32, 2, 8, True, False),
    # final conv: bn=False
    (32, 2, 16, False, False),
]


def init_spinnet_params(key: jax.Array, dim: int = 32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 2 + len(_CONV3D_CHANNELS) + len(_CONV2D_SPECS)))
    params: Dict[str, Any] = {
        "xyz_raising": {
            "w": jax.random.normal(next(ks), (1, 1, 3, 16)) * 0.3,
            "b": jnp.zeros((16,)),
        },
        "bn_xyz": {"mean": jnp.zeros((16,)), "var": jnp.ones((16,)), "gamma": jnp.ones((16,)), "beta": jnp.zeros((16,))},
        "conv3d": [],
        "conv2d": [],
    }
    c = 16
    for out in _CONV3D_CHANNELS:
        params["conv3d"].append(
            {
                "w": jax.random.normal(next(ks), (3, 3, 3, c, out)) * math.sqrt(2.0 / (27 * c)),
                "b": jnp.zeros((out,)),
                "bn": _bn_init(out),
            }
        )
        c = out
    specs = list(_CONV2D_SPECS)
    specs[-1] = (dim, 2, 16, False, False)
    for out, k, d, bn, relu in specs:
        params["conv2d"].append(
            {
                "w": jax.random.normal(next(ks), (k, k, c, out)) * math.sqrt(2.0 / (k * k * c)),
                "b": jnp.zeros((out,)),
                "bn": _bn_init(out) if bn else None,
            }
        )
        c = out
    return params


def _pad_ele_azi(x, eff_k):
    """Circular pad on azimuth (last axis), zero pad on elevation
    (`common.py:295-344`). x: [..., ele, azi]."""
    if eff_k % 2 == 0:
        p = eff_k // 2
        x = jnp.concatenate([x, x[..., :p]], axis=-1)
        zeros = jnp.zeros(x.shape[:-2] + (p, x.shape[-1]), x.dtype)
        x = jnp.concatenate([x, zeros], axis=-2)
    else:
        p = (eff_k - 1) // 2
        x = jnp.concatenate([x[..., -p:], x, x[..., :p]], axis=-1)
        zeros = jnp.zeros(x.shape[:-2] + (p, x.shape[-1]), x.dtype)
        x = jnp.concatenate([zeros, x, zeros], axis=-2)
    return x


@partial(jax.jit, static_argnames=("rad_n", "azi_n", "ele_n", "voxel_sample"))
def spinnet_forward(
    params: Dict[str, Any],
    patches: jnp.ndarray,  # [B, P, 3] (last point is the keypoint center)
    grid_pts: jnp.ndarray,  # [rad*ele*azi, 3]
    rad_n: int = 9,
    azi_n: int = 60,
    ele_n: int = 30,
    voxel_r: float = 0.3,
    voxel_sample: int = 30,
) -> jnp.ndarray:
    """[B, P, 3] patches -> [B, dim] descriptors (`Descriptor_Net.forward`)."""
    center = patches[:, -1:, :]
    delta = patches - center  # KITTI: no z-axis canonicalization

    rel = sphere_query_rel(delta, grid_pts, voxel_r, voxel_sample)  # [B, N, k, 3]
    rel = var_to_invar(rel, rad_n, azi_n, ele_n)
    return spinnet_trunk(params, rel, rad_n, azi_n, ele_n)


def spinnet_trunk(
    params: Dict[str, Any],
    rel: jnp.ndarray,  # [B, N, k, 3] azimuth-aligned in-voxel samples
    rad_n: int,
    azi_n: int,
    ele_n: int,
) -> jnp.ndarray:
    """Learned trunk from the grouped samples on (`model.py:60-72` +
    `ThreeDCCN.py:57-97`) — split out so the torch-parity fixtures can pin the
    converter without the geometric partition."""
    # Point lift: 1x1 conv (3->16) + BN + ReLU + max over samples.
    h = jnp.einsum("bnkc,cd->bnkd", rel, params["xyz_raising"]["w"][0, 0]) + params["xyz_raising"]["b"]
    bnp = params["bn_xyz"]
    h = (h - bnp["mean"]) * jax.lax.rsqrt(bnp["var"] + 1e-5) * bnp["gamma"] + bnp["beta"]
    h = jax.nn.relu(h)
    h = jnp.max(h, axis=2)  # [B, N, 16]
    x = h.reshape(h.shape[0], rad_n, ele_n, azi_n, -1)  # [B, D, H, W, C] (NDHWC)

    # 3D convs: no D padding (shrinks rad_n), padded H/W.
    for layer in params["conv3d"]:
        x = _pad_ele_azi(jnp.moveaxis(x, -1, 1), 3)  # [B, C, D, H+2, W+...]
        x = jnp.moveaxis(x, 1, -1)
        x = jax.lax.conv_general_dilated(
            x, layer["w"], (1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + layer["b"]
        x = jax.nn.relu(_bn(x, layer["bn"]))

    x = x[:, 0]  # D collapsed to 1 -> [B, H, W, C] (NHWC)

    for (_, _, d, _, relu), layer in zip(_CONV2D_SPECS, params["conv2d"]):
        k = layer["w"].shape[0]
        eff = k + (k - 1) * (d - 1)
        x = jnp.moveaxis(_pad_ele_azi(jnp.moveaxis(x, -1, 1), eff), 1, -1)
        x = jax.lax.conv_general_dilated(
            x, layer["w"], (1, 1), padding="VALID", rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + layer["b"]
        if layer["bn"] is not None:
            x = _bn(x, layer["bn"])
        if relu:
            x = jax.nn.relu(x)

    return jnp.max(x, axis=(1, 2))  # global max pool -> [B, dim]


def load_spinnet_state_dict(state_dict: Dict[str, np.ndarray], dim: int = 32) -> Dict[str, Any]:
    """Converter for `KITTI_best.pkl` (DataParallel 'module.' prefix stripped)."""
    sd = {}
    for k, v in state_dict.items():
        sd[k[7:] if k.startswith("module.") else k] = np.asarray(v)

    params: Dict[str, Any] = {
        "xyz_raising": {
            "w": jnp.asarray(sd["xyz_raising.weight"].transpose(2, 3, 1, 0)),  # [1,1,3,16]
            "b": jnp.asarray(sd["xyz_raising.bias"]),
        },
        "bn_xyz": {
            "gamma": jnp.asarray(sd["bn_xyz_raising.weight"]),
            "beta": jnp.asarray(sd["bn_xyz_raising.bias"]),
            "mean": jnp.asarray(sd["bn_xyz_raising.running_mean"]),
            "var": jnp.asarray(sd["bn_xyz_raising.running_var"]),
        },
        "conv3d": [],
        "conv2d": [],
    }
    # conv_net.ops: interleaved Conv/BN/ReLU modules; convs at known indices.
    # Gather conv and bn op indices in order.
    conv_ids = sorted(
        int(k.split(".")[2]) for k in sd if k.startswith("conv_net.ops.") and k.endswith(".weight") and sd[k].ndim >= 4
    )
    bn_ids = sorted(
        int(k.split(".")[2]) for k in sd if k.startswith("conv_net.ops.") and k.endswith(".running_mean")
    )
    bn_for_conv = {}
    for cid in conv_ids:
        nxt = [b for b in bn_ids if b > cid]
        prev_conv = [c for c in conv_ids if c > cid]
        if nxt and (not prev_conv or nxt[0] < prev_conv[0]):
            bn_for_conv[cid] = nxt[0]

    for cid in conv_ids:
        w = sd[f"conv_net.ops.{cid}.weight"]
        b = sd[f"conv_net.ops.{cid}.bias"]
        bn = None
        if cid in bn_for_conv:
            bid = bn_for_conv[cid]
            bn = {
                "mean": jnp.asarray(sd[f"conv_net.ops.{bid}.running_mean"]),
                "var": jnp.asarray(sd[f"conv_net.ops.{bid}.running_var"]),
            }
        if w.ndim == 5:  # Conv3d [out, in, kD, kH, kW] -> DHWIO
            params["conv3d"].append(
                {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)), "b": jnp.asarray(b), "bn": bn}
            )
        else:  # Conv2d [out, in, kH, kW] -> HWIO
            params["conv2d"].append(
                {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b), "bn": bn}
            )
    return params
