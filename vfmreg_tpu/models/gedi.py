"""GeDi (Generalisable and distinctive 3D local deep descriptors) in JAX.

Reimplements `gedi/gedi.py` (reference #23): SVD local reference frames with
sign disambiguation (`LRF._forward`, `gedi.py:84-141`), qnet canonicalizing
quaternion T-net (`gedi.py:55-60` + `tnet`), and the PointNet++ SSG backbone
(`PointNet2Feature`, `gedi.py:68-129`) built on the JAX pointnet2 ops
(`ops/pointnet2.py`), ending in a 32-d L2-normalized descriptor.

Configuration from `descriptors.py:118-146`: dim=32, r_lrf=0.5,
samples_per_patch_lrf=4000, samples_per_patch_out=512, batch 250.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vfmreg_tpu.ops.pointnet2 import ball_query, furthest_point_sampling


def _dense_init(key, n_in, n_out, bias=False):
    k1, _ = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (n_in, n_out)) * math.sqrt(2.0 / n_in)}
    p["b"] = jnp.zeros((n_out,)) if bias else None
    return p


def _bn_init(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)), "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _bn(x, p, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["gamma"] + p["beta"]


def _apply_dense(x, p):
    y = x @ p["w"]
    return y if p["b"] is None else y + p["b"]


def init_gedi_params(key: jax.Array, dim: int = 32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 40))
    qnet = {
        "conv1": _dense_init(next(ks), 3, 256), "bn1": _bn_init(256),
        "conv2": _dense_init(next(ks), 256, 512), "bn2": _bn_init(512),
        "conv3": _dense_init(next(ks), 512, 1024), "bn3": _bn_init(1024),
        "fc1": _dense_init(next(ks), 1024, 512), "bn4": _bn_init(512),
        "fc2": _dense_init(next(ks), 512, 256), "bn5": _bn_init(256),
        "fc3": _dense_init(next(ks), 256, 4, bias=True),
    }

    def sa(mlp):
        layers = []
        for i in range(len(mlp) - 1):
            layers.append({"conv": _dense_init(next(ks), mlp[i], mlp[i + 1]), "bn": _bn_init(mlp[i + 1])})
        return layers

    return {
        "qnet": qnet,
        "sa1": sa([3, 128, 128, 128]),
        "sa2": sa([128 + 3, 256, 256, 256]),
        "sa3": sa([256 + 3, 512, 512, 1024]),
        "fc": [
            {"dense": _dense_init(next(ks), 1024, 512), "bn": _bn_init(512)},
            {"dense": _dense_init(next(ks), 512, 256), "bn": _bn_init(256)},
            {"dense": _dense_init(next(ks), 256, dim, bias=True), "bn": None},
        ],
    }


def _qnet(params, x):
    """[B, N, 3] -> unit quaternion [B, 4] (qnet: tnet with 4-d head + [1,0,0,0])."""
    h = jax.nn.relu(_bn(_apply_dense(x, params["conv1"]), params["bn1"]))
    h = jax.nn.relu(_bn(_apply_dense(h, params["conv2"]), params["bn2"]))
    h = _bn(_apply_dense(h, params["conv3"]), params["bn3"])
    h = jnp.max(h, axis=1)
    h = jax.nn.relu(_bn(_apply_dense(h, params["fc1"]), params["bn4"]))
    h = jax.nn.relu(_bn(_apply_dense(h, params["fc2"]), params["bn5"]))
    q = _apply_dense(h, params["fc3"]) + jnp.array([1.0, 0, 0, 0])
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def _quat_to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def _sa_module(layers, xyz, features, npoint, radius, nsample):
    """PointnetSAModule (SSG): FPS -> ball query -> relative xyz ++ features ->
    shared MLP -> max pool. features: [B, N, C] or None."""
    if npoint is None:
        # GroupAll
        new_xyz = jnp.zeros((xyz.shape[0], 1, 3))
        grouped_xyz = xyz[:, None, :, :]  # [B, 1, N, 3]
        grouped_feat = features[:, None, :, :] if features is not None else None
    else:
        fps_idx = furthest_point_sampling(xyz, npoint, skip_near_origin=True)
        new_xyz = jax.vmap(lambda p, i: p[i])(xyz, fps_idx)
        idx = ball_query(radius, nsample, xyz, new_xyz)  # [B, S, k]
        grouped_xyz = jax.vmap(lambda p, i: p[i])(xyz, idx) - new_xyz[:, :, None, :]
        grouped_feat = jax.vmap(lambda f, i: f[i])(features, idx) if features is not None else None

    h = grouped_xyz if grouped_feat is None else jnp.concatenate([grouped_xyz, grouped_feat], -1)
    for layer in layers:
        h = jax.nn.relu(_bn(_apply_dense(h, layer["conv"]), layer["bn"]))
    return new_xyz, jnp.max(h, axis=2)  # [B, S, C_out]


@jax.jit
def gedi_forward(params: Dict[str, Any], patches: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] canonicalized patches -> [B, dim] descriptors
    (`PointNet2Feature._forward`, `gedi.py:107-120`)."""
    q = _qnet(params["qnet"], patches)
    Rm = _quat_to_matrix(q)
    pc = jnp.einsum("bij,bnj->bni", Rm, patches)

    xyz, feat = _sa_module(params["sa1"], pc, None, npoint=128, radius=0.2, nsample=32)
    xyz, feat = _sa_module(params["sa2"], xyz, feat, npoint=64, radius=0.4, nsample=16)
    _, feat = _sa_module(params["sa3"], xyz, feat, npoint=None, radius=None, nsample=None)
    h = feat[:, 0]  # [B, 1024]
    h = jax.nn.relu(_bn(_apply_dense(h, params["fc"][0]["dense"]), params["fc"][0]["bn"]))
    h = jax.nn.relu(_bn(_apply_dense(h, params["fc"][1]["dense"]), params["fc"][1]["bn"]))
    h = _apply_dense(h, params["fc"][2]["dense"])
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("samples_per_patch_out",))
def gedi_lrf_patches(
    centers: jnp.ndarray,  # [B, 3]
    nbr_pts: jnp.ndarray,  # [B, K, 3] in-radius neighborhood samples
    nbr_mask: jnp.ndarray,  # [B, K]
    key: jax.Array,
    r_lrf: float = 0.5,
    samples_per_patch_out: int = 512,
):
    """GeDi's LRF canonicalization (`LRF._forward` + `forward`, `gedi.py:84-141`):
    z from the smallest covariance direction of (p - pi) with sign toward the
    mass, x from the alpha*beta-weighted in-plane sum, patch = lrf^T (pi - p)/r."""

    def per_patch(p, nn, m, subkey):
        x = (p[None, :] - nn) * m[:, None]  # p - pi, zero-masked
        cov = x.T @ x / nn.shape[0]  # reference divides by N (c), not count
        _, vecs = jnp.linalg.eigh(cov)
        v_small = vecs[:, 0]
        sign = jnp.where(jnp.sum(x @ v_small) >= 0, 1.0, -1.0)
        zp = sign * v_small
        xi = -x  # pi - p
        norm = xi @ zp
        vi = xi - norm[:, None] * zp
        alpha = (r_lrf - jnp.linalg.norm(xi, axis=-1)) ** 2
        beta = norm * norm
        vi_c = jnp.sum((alpha * beta * m)[:, None] * vi, axis=0)
        xp = vi_c / jnp.maximum(jnp.linalg.norm(vi_c), 1e-12)
        yp = jnp.cross(xp, zp)
        lrf = jnp.stack([xp, yp, zp], axis=1)

        # Sample only VALID (in-radius) slots — masked slots hold arbitrary
        # clipped-sentinel points. Valid slots shuffle to the front; positions
        # past the valid count wrap to random valid replicas, matching the
        # reference's pad-with-replicas sampling (`gedi.py:253-262`).
        k1, k2 = jax.random.split(subkey)
        r = jax.random.uniform(k1, (nn.shape[0],))
        order = jnp.argsort(jnp.where(m, r, 1.0 + r))  # valid first, shuffled
        cnt = jnp.maximum(jnp.sum(m.astype(jnp.int32)), 1)
        pos = jnp.arange(samples_per_patch_out)
        replica = jax.random.randint(k2, (samples_per_patch_out,), 0, cnt)
        sel = jnp.where(pos < cnt, order[jnp.minimum(pos, nn.shape[0] - 1)], order[replica])
        local = ((nn - p) / r_lrf) @ lrf
        # Zero-neighbor patches (isolated keypoints; the reference CRASHES on
        # these — `np.random.choice` from an empty ball) degrade to the
        # all-center patch (rel = 0) instead of a repeated garbage slot.
        return jnp.where(jnp.any(m), local[sel], 0.0)

    keys = jax.random.split(key, centers.shape[0])
    return jax.vmap(per_patch)(centers, nbr_pts, nbr_mask, keys)


def load_gedi_state_dict(state_dict: Dict[str, np.ndarray], dim: int = 32) -> Dict[str, Any]:
    """Converter for `chkpt.tar['pnet_model_state_dict']` (PointNet2Feature)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv1d(p, bias=False):
        w = sd[p + ".weight"]
        w = w[:, :, 0] if w.ndim == 3 else w
        out = {"w": jnp.asarray(w.T), "b": jnp.asarray(sd[p + ".bias"]) if bias else None}
        return out

    def conv2d(p):  # SA-module Conv2d kernels [out, in, 1, 1]
        return {"w": jnp.asarray(sd[p + ".weight"][:, :, 0, 0].T), "b": None if p + ".bias" not in sd else jnp.asarray(sd[p + ".bias"])}

    def lin(p, bias=True):
        return {"w": jnp.asarray(sd[p + ".weight"].T), "b": jnp.asarray(sd[p + ".bias"]) if bias and p + ".bias" in sd else None}

    def bn(p):
        return {
            "gamma": jnp.asarray(sd[p + ".weight"]),
            "beta": jnp.asarray(sd[p + ".bias"]),
            "mean": jnp.asarray(sd[p + ".running_mean"]),
            "var": jnp.asarray(sd[p + ".running_var"]),
        }

    qnet = {
        "conv1": conv1d("qnet.conv1.0"), "bn1": bn("qnet.conv1.1"),
        "conv2": conv1d("qnet.conv2.0"), "bn2": bn("qnet.conv2.1"),
        "conv3": conv1d("qnet.conv3.0"), "bn3": bn("qnet.conv3.1"),
        "fc1": lin("qnet.fc1.0", bias=False), "bn4": bn("qnet.fc1.1"),
        "fc2": lin("qnet.fc2.0", bias=False), "bn5": bn("qnet.fc2.1"),
        "fc3": lin("qnet.fc3", bias=True),
    }

    def sa(prefix, n_layers):
        # The vendored pointnet2 `build_shared_mlp` is a plain Sequential of
        # [Conv2d, BatchNorm2d, ReLU] per spec entry (`pointnet2_modules.py:9-18`),
        # so convs sit at indices 3i and BNs at 3i+1.
        layers = []
        for i in range(n_layers):
            layers.append(
                {"conv": conv2d(f"{prefix}.mlps.0.{3 * i}"), "bn": bn(f"{prefix}.mlps.0.{3 * i + 1}")}
            )
        return layers

    return {
        "qnet": qnet,
        "sa1": sa("samodule1", 3),
        "sa2": sa("samodule2", 3),
        "sa3": sa("samodule3", 3),
        "fc": [
            {"dense": lin("fc_layer.0", bias=False), "bn": bn("fc_layer.1")},
            {"dense": lin("fc_layer.3", bias=False), "bn": bn("fc_layer.4")},
            {"dense": lin("fc_layer.7", bias=True), "bn": None},
        ],
    }
