"""DIP (Distinctive Invariant Patches) descriptor in JAX.

Reimplements `dip/{network.py,lrf.py}` (reference #21): eigen-decomposition
local reference frames with z-sign disambiguation and alpha*beta-weighted
x-axis (Gojcic et al. "The Perfect Match" LRF), kernel-normalized 256-point
patches, and the PointNetFeature network (STN3d T-net + 3 conv layers ->
max-pool -> 3 FC -> 32-d, L2-normalized).

TPU design: the per-point LRF + patch extraction — a Python loop over
`search_radius_vector_3d` in the reference (`descriptors.py:66-69`) — becomes a
single vmapped fixed-shape pipeline over the radius-kNN results of the hash
grid (neighbors capped at `max_neighbors`; the reference uses every in-radius
point, which this approximates for ultra-dense clouds).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

PATCH_SIZE = 256  # descriptors.py:47
LRF_KERNEL = 0.6 * math.sqrt(3)  # descriptors.py:66


# --------------------------------------------------------------------- network
def _dense_init(key, n_in, n_out, bias=True):
    k1, _ = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (n_in, n_out)) * math.sqrt(2.0 / n_in)}
    if bias:
        p["b"] = jnp.zeros((n_out,))
    return p


def _bn_init(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)), "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_dip_params(key: jax.Array, dim: int = 32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 16))
    stn = {
        "conv1": _dense_init(next(ks), 3, 256), "bn1": _bn_init(256),
        "conv2": _dense_init(next(ks), 256, 512), "bn2": _bn_init(512),
        "conv3": _dense_init(next(ks), 512, 1024), "bn3": _bn_init(1024),
        "fc1": _dense_init(next(ks), 1024, 512), "bn4": _bn_init(512),
        "fc2": _dense_init(next(ks), 512, 256), "bn5": _bn_init(256),
        "fc3": _dense_init(next(ks), 256, 9),
    }
    net = {
        "stn": stn,
        "conv1": _dense_init(next(ks), 3, 256), "bn1": _bn_init(256),
        "conv2": _dense_init(next(ks), 256, 512), "bn2": _bn_init(512),
        "conv3": _dense_init(next(ks), 512, 1024), "bn3": _bn_init(1024),
        "fc1": _dense_init(next(ks), 1024, 512), "bn4": _bn_init(512),
        "fc2": _dense_init(next(ks), 512, 256), "bn5": _bn_init(256),
        "fc3": _dense_init(next(ks), 256, dim),
    }
    return net


def _bn(x, p, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["gamma"] + p["beta"]


def _stn3d(params, x):
    """T-net: [B, N, 3] -> [B, 3, 3] (`network.py:6-45`)."""
    h = jax.nn.relu(_bn(x @ params["conv1"]["w"] + params["conv1"]["b"], params["bn1"]))
    h = jax.nn.relu(_bn(h @ params["conv2"]["w"] + params["conv2"]["b"], params["bn2"]))
    h = _bn(h @ params["conv3"]["w"] + params["conv3"]["b"], params["bn3"])
    h = jnp.max(h, axis=1)
    h = jax.nn.relu(_bn(h @ params["fc1"]["w"] + params["fc1"]["b"], params["bn4"]))
    h = jax.nn.relu(_bn(h @ params["fc2"]["w"] + params["fc2"]["b"], params["bn5"]))
    h = h @ params["fc3"]["w"] + params["fc3"]["b"]
    iden = jnp.array([1, 0, 0, 0, 1, 0, 0, 0, 1], dtype=h.dtype)
    return (h + iden).reshape(-1, 3, 3)


@jax.jit
def dip_forward(params: Dict[str, Any], patches: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] patches -> [B, dim] L2-normalized descriptors
    (`PointNetFeature._forward`, `network.py:72-96`)."""
    trans = _stn3d(params["stn"], patches)
    x = jnp.einsum("bij,bnj->bni", trans, patches)
    h = jax.nn.relu(_bn(x @ params["conv1"]["w"] + params["conv1"]["b"], params["bn1"]))
    h = jax.nn.relu(_bn(h @ params["conv2"]["w"] + params["conv2"]["b"], params["bn2"]))
    h = _bn(h @ params["conv3"]["w"] + params["conv3"]["b"], params["bn3"])
    h = jnp.max(h, axis=1)
    h = jax.nn.relu(_bn(h @ params["fc1"]["w"] + params["fc1"]["b"], params["bn4"]))
    h = jax.nn.relu(_bn(h @ params["fc2"]["w"] + params["fc2"]["b"], params["bn5"]))
    h = h @ params["fc3"]["w"] + params["fc3"]["b"]
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)


def load_dip_state_dict(state_dict: Dict[str, np.ndarray], dim: int = 32) -> Dict[str, Any]:
    """Converter for the torch `final_chkpt.pth` (Sequential conv/bn naming)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(p):  # Conv1d [out, in, 1]
        return {"w": jnp.asarray(sd[p + ".weight"][:, :, 0].T), "b": jnp.asarray(sd[p + ".bias"])}

    def lin(p):
        return {"w": jnp.asarray(sd[p + ".weight"].T), "b": jnp.asarray(sd[p + ".bias"])}

    def bn(p):
        return {
            "gamma": jnp.asarray(sd[p + ".weight"]),
            "beta": jnp.asarray(sd[p + ".bias"]),
            "mean": jnp.asarray(sd[p + ".running_mean"]),
            "var": jnp.asarray(sd[p + ".running_var"]),
        }

    def tower(prefix):
        return {
            "conv1": conv(prefix + "conv1.0"), "bn1": bn(prefix + "conv1.1"),
            "conv2": conv(prefix + "conv2.0"), "bn2": bn(prefix + "conv2.1"),
            "conv3": conv(prefix + "conv3.0"), "bn3": bn(prefix + "conv3.1"),
            "fc1": lin(prefix + "fc1.0"), "bn4": bn(prefix + "fc1.1"),
            "fc2": lin(prefix + "fc2.0"),
            "fc3": lin(prefix + "fc3.0"),
        }

    net = tower("")
    net["bn5"] = bn("fc2.2")  # Dropout at fc2.1 shifts the BN index
    net["stn"] = tower("stn3d.")
    net["stn"]["bn5"] = bn("stn3d.fc2.1")
    net["stn"]["fc3"] = lin("stn3d.fc3.0")
    return net


# ------------------------------------------------------------------------- LRF
@partial(jax.jit, static_argnames=("patch_size",))
def compute_lrf_patches(
    points: jnp.ndarray,  # [N, 3] cloud (padded)
    mask: jnp.ndarray,
    nbr_idx: jnp.ndarray,  # [N, K] radius-kNN neighbor indices (into points)
    nbr_mask: jnp.ndarray,  # [N, K]
    key: jax.Array,
    lrf_kernel: float = LRF_KERNEL,
    patch_size: int = PATCH_SIZE,
):
    """Vmapped LRF + patch extraction (`lrf.py:21-82`).

    Per point: covariance of in-radius neighbors about the point, smallest
    eigenvector as z (sign toward the point), alpha*beta-weighted in-plane
    x-axis, patch = neighbors rotated into the frame / kernel, zero-padded and
    randomly subsampled to `patch_size`.
    """
    n, k = nbr_idx.shape

    def per_point(pt, idx, m, subkey):
        nn = points[idx]  # [K, 3] (includes self at slot 0 typically)
        diff = nn - pt  # ptnn - pt
        w = m.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(w), 1.0)
        cov = jnp.einsum("ki,k,kj->ij", diff, w, diff) / cnt
        _, vecs = jnp.linalg.eigh(cov)
        np_hat = vecs[:, 0]
        # eq. 4: z sign toward the center
        zp_sign = jnp.where(jnp.sum(-(diff @ np_hat) * w) > 0, 1.0, -1.0)
        zp = np_hat * zp_sign
        # in-plane component
        v = diff - (diff @ zp)[:, None] * zp
        dist = jnp.linalg.norm(diff, axis=-1)
        alpha = (lrf_kernel - dist) ** 2
        beta = (diff @ zp) ** 2
        xp = jnp.sum(v * (alpha * beta * w)[:, None], axis=0)
        xp = xp / jnp.maximum(jnp.linalg.norm(xp), 1e-12)
        yp = jnp.cross(xp, zp)
        lRg = jnp.stack([xp, yp, zp], axis=1)  # columns

        local = (nn - pt) @ lRg  # == lRg.T @ (p - pt)
        local = local / lrf_kernel
        local = jnp.where(m[:, None], local, 0.0)  # zero-pad like the reference

        # Random subsample to patch_size without replacement (`lrf.py:79-81`).
        perm = jax.random.permutation(subkey, k)[:patch_size]
        return local[perm], lRg

    keys = jax.random.split(key, n)
    patches, frames = jax.vmap(per_point)(points, nbr_idx, nbr_mask, keys)
    return patches, frames
