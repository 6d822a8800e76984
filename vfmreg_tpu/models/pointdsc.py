"""PointDSC — deep spatial-consistency correspondence outlier rejection, in JAX.

Reimplements `pointdsc/{PointDSC.py,common.py,SE3.py}` (reference #27):
  * spatial-consistency-guided NonLocal encoder (`PointDSC.py:9-80`);
  * MLP confidence + NMS seed selection (`pick_seeds`, `:205-226`);
  * per-seed k=40 feature/spatial consistency matrices, leading-eigenvector
    weighting by power iteration (`cal_seed_trans`, `:240-375`,
    `cal_leading_eigenvector`, `:377-395`);
  * weighted Procrustes per seed (`common.py:7-49`), hypothesis selection by
    inlier count, iterative post-refinement (`post_refinement`, `:444-480`).

Harness configuration mirrors `registration_node.py:232-241`: in_dim=6,
num_layers=12, num_channels=128, num_iterations=10, ratio=0.1, sigma_d=1.2,
k=40, nms_radius=0.6 (inlier_threshold stays at the 0.10 default, including in
post-refinement — reproducing the reference's configuration as-is).

Everything is fixed-shape jitted JAX; BatchNorms run in eval mode from the
converted running statistics.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vfmreg_tpu.registration.procrustes import weighted_kabsch


def _dense(key, n_in, n_out):
    k1, _ = jax.random.split(key)
    w = jax.random.normal(k1, (n_in, n_out)) * math.sqrt(2.0 / (n_in + n_out))
    return {"w": w, "b": jnp.zeros((n_out,))}


def _bn():
    return {
        "gamma": jnp.ones(()),  # filled per-channel on load
    }


def init_pointdsc_params(
    key: jax.Array, in_dim=6, num_layers=12, num_channels=128
) -> Dict[str, Any]:
    keys = jax.random.split(key, 4 + num_layers * 8)
    ki = iter(keys)

    def bn(c):
        return {
            "gamma": jnp.ones((c,)),
            "beta": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)),
            "var": jnp.ones((c,)),
        }

    params: Dict[str, Any] = {
        "layer0": _dense(next(ki), in_dim, num_channels),
        "blocks": [],
        "classification": [
            _dense(next(ki), num_channels, 32),
            _dense(next(ki), 32, 32),
            _dense(next(ki), 32, 1),
        ],
        "sigma": jnp.ones(()),
    }
    c = num_channels
    for _ in range(num_layers):
        params["blocks"].append(
            {
                "pointcn": {"dense": _dense(next(ki), c, c), "bn": bn(c)},
                "q": _dense(next(ki), c, c),
                "k": _dense(next(ki), c, c),
                "v": _dense(next(ki), c, c),
                "msg1": {"dense": _dense(next(ki), c, c // 2), "bn": bn(c // 2)},
                "msg2": {"dense": _dense(next(ki), c // 2, c // 2), "bn": bn(c // 2)},
                "msg3": _dense(next(ki), c // 2, c),
            }
        )
    return params


def _apply_bn(x, bn, eps=1e-5):
    return (x - bn["mean"]) * jax.lax.rsqrt(bn["var"] + eps) * bn["gamma"] + bn["beta"]


def _nonlocal_block(feat, attention, block, num_channels, col_mask=None):
    """`NonLocalBlock.forward` (`PointDSC.py:28-50`). feat: [N, C].

    col_mask excludes PADDING columns from the softmax: the reference runs
    unpadded, and a pad column's attention*logits = 0 would otherwise weigh
    exp(0) = 1 — mixing pad rows' (bias-driven) V into every real message."""
    Q = feat @ block["q"]["w"] + block["q"]["b"]
    K = feat @ block["k"]["w"] + block["k"]["b"]
    V = feat @ block["v"]["w"] + block["v"]["b"]
    logits = (Q @ K.T) / math.sqrt(num_channels)
    scores = attention * logits
    if col_mask is not None:
        scores = jnp.where(col_mask[None, :], scores, -jnp.inf)
    weight = jax.nn.softmax(scores, axis=-1)
    message = weight @ V
    m = jax.nn.relu(_apply_bn(message @ block["msg1"]["dense"]["w"] + block["msg1"]["dense"]["b"], block["msg1"]["bn"]))
    m = jax.nn.relu(_apply_bn(m @ block["msg2"]["dense"]["w"] + block["msg2"]["dense"]["b"], block["msg2"]["bn"]))
    m = m @ block["msg3"]["w"] + block["msg3"]["b"]
    return feat + m


def pointdsc_encode(
    params: Dict[str, Any],
    corr_pos: jnp.ndarray,
    compat: jnp.ndarray,
    mask: jnp.ndarray = None,
):
    """NonLocalNet encoder + confidence head (`PointDSC.py:52-80,175-180`).

    corr_pos [N, in_dim], compat [N, N] -> (feat [N, C], confidence [N]).
    Split out of `pointdsc_forward` so the torch-parity fixtures can pin the
    converter against the reference encoder in isolation. `mask` (None =
    all valid) keeps padding rows out of the NonLocal softmax — the reference
    runs unpadded, so pads must be inert for parity at bucketed shapes."""
    num_channels = params["layer0"]["w"].shape[1]
    feat = corr_pos @ params["layer0"]["w"] + params["layer0"]["b"]
    for block in params["blocks"]:
        feat = jax.nn.relu(
            _apply_bn(
                feat @ block["pointcn"]["dense"]["w"] + block["pointcn"]["dense"]["b"],
                block["pointcn"]["bn"],
            )
        )
        feat = _nonlocal_block(feat, compat, block, num_channels, col_mask=mask)
    h = feat
    for i, layer in enumerate(params["classification"]):
        h = h @ layer["w"] + layer["b"]
        if i < 2:
            h = jax.nn.relu(h)
    return feat, h[:, 0]


@partial(jax.jit, static_argnames=("num_iterations", "k", "ratio_num", "refine_iters"))
def pointdsc_forward(
    params: Dict[str, Any],
    corr_pos: jnp.ndarray,  # [N, 6]
    src_keypts: jnp.ndarray,  # [N, 3]
    tgt_keypts: jnp.ndarray,  # [N, 3]
    mask: jnp.ndarray,  # [N]
    sigma_d=1.2,
    nms_radius=0.6,
    inlier_threshold=0.10,
    num_iterations: int = 10,
    k: int = 40,
    ratio_num: int = 0,  # number of seeds (num_corr * ratio); 0 -> N // 10
    refine_iters: int = 20,
):
    n = corr_pos.shape[0]
    num_channels = params["layer0"]["w"].shape[1]
    num_seeds = ratio_num if ratio_num > 0 else max(n // 10, 1)
    big = jnp.float32(1e9)

    # ---- Step 1: compatibility + NonLocal encoder (`PointDSC.py:154-163`) ----
    src_dist = jnp.linalg.norm(src_keypts[:, None, :] - src_keypts[None, :, :], axis=-1)
    tgt_dist = jnp.linalg.norm(tgt_keypts[:, None, :] - tgt_keypts[None, :, :], axis=-1)
    compat = src_dist - tgt_dist
    compat = jnp.clip(1.0 - compat**2 / (sigma_d**2), 0.0, None)
    compat = jnp.where(mask[:, None] & mask[None, :], compat, 0.0)

    feat, confidence = pointdsc_encode(params, corr_pos, compat, mask)
    normed_feat = feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)

    # ---- Step 2: confidence + NMS seeds (`:175-226`) ----
    confidence = jnp.where(mask, confidence, -big)

    # Parallel NMS: i is a local max if for all j with dist < R, conf_i >= conf_j.
    score_relation = (confidence[:, None] >= confidence[None, :]) | (src_dist >= nms_radius)
    is_local_max = jnp.all(score_relation, axis=-1).astype(jnp.float32)
    seed_scores = jnp.where(mask, confidence * is_local_max, -big)
    seeds = jnp.argsort(-seed_scores)[:num_seeds]

    # ---- Step 3: per-seed consistency + power iteration (`:240-330`) ----
    sigma2 = params["sigma"] ** 2
    # Feature-space kNN (k+1 then drop self) over normalized features.
    pdist = 2.0 - 2.0 * (normed_feat @ normed_feat.T)
    pdist = jnp.where(mask[None, :], pdist, big)
    knn_idx_all = jnp.argsort(pdist, axis=-1)[:, 1 : k + 1]  # [N, k]
    knn_idx = knn_idx_all[seeds]  # [S, k]

    knn_feat = normed_feat[knn_idx]  # [S, k, C]
    feat_M = knn_feat @ jnp.swapaxes(knn_feat, -1, -2)
    feat_M = jnp.clip(1.0 - (1.0 - feat_M) / sigma2, 0.0, None)

    src_knn = src_keypts[knn_idx]  # [S, k, 3]
    tgt_knn = tgt_keypts[knn_idx]
    d_src = jnp.linalg.norm(src_knn[:, :, None, :] - src_knn[:, None, :, :], axis=-1)
    d_tgt = jnp.linalg.norm(tgt_knn[:, :, None, :] - tgt_knn[:, None, :, :], axis=-1)
    spat_M = jnp.clip(1.0 - (d_src - d_tgt) ** 2 / (sigma_d**2), 0.0, None)

    total_M = feat_M * spat_M
    total_M = total_M * (1.0 - jnp.eye(k))

    def power_iter(_, v):
        v = jnp.einsum("skj,sj->sk", total_M, v)
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-6)

    weight = jax.lax.fori_loop(0, num_iterations, power_iter, jnp.ones((num_seeds, k)))
    weight = weight / (jnp.sum(weight, axis=-1, keepdims=True) + 1e-6)

    # ---- Step 4: weighted Procrustes per seed + inlier-count selection ----
    seed_trans = weighted_kabsch(src_knn, tgt_knn, weight)  # [S, 4, 4]
    moved = jnp.einsum("sij,nj->sni", seed_trans[:, :3, :3], src_keypts) + seed_trans[:, None, :3, 3]
    L2 = jnp.linalg.norm(moved - tgt_keypts[None], axis=-1)  # [S, N]
    inl = (L2 < inlier_threshold) & mask[None, :]
    fitness = jnp.mean(inl.astype(jnp.float32), axis=-1)
    best = jnp.argmax(fitness)
    final_trans = seed_trans[best]
    # Reference `final_labels` are the inliers of the best SEED transform,
    # BEFORE post refinement (`cal_seed_trans`, `PointDSC.py:215-220`).
    labels_pre = inl[best]

    # ---- post refinement (`post_refinement`, `:444-480`): iterate weighted
    # Procrustes on the current inliers, stopping (freezing) once the inlier
    # COUNT stops changing, exactly like the reference's break. ----
    def refine(_, carry):
        T, prev_count = carry
        moved = src_keypts @ T[:3, :3].T + T[:3, 3]
        L2 = jnp.linalg.norm(moved - tgt_keypts, axis=-1)
        inlier = (L2 < inlier_threshold) & mask
        count = jnp.sum(inlier)
        w = jnp.where(inlier, 1.0 / (1.0 + (L2 / inlier_threshold) ** 2), 0.0)
        T_new = weighted_kabsch(src_keypts, tgt_keypts, w)
        do_update = (count != prev_count) & (count >= 3)
        return jnp.where(do_update, T_new, T), count

    final_trans, _ = jax.lax.fori_loop(
        0, refine_iters, refine, (final_trans, jnp.int32(0))
    )
    return {"final_trans": final_trans, "final_labels": labels_pre, "confidence": confidence}


def load_pointdsc_state_dict(state_dict: Dict[str, np.ndarray], num_layers=12) -> Dict[str, Any]:
    """Convert the torch `model_best.pkl` state dict (Conv1d kernels [out, in, 1])."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        return {
            "w": jnp.asarray(sd[prefix + ".weight"][:, :, 0].T),
            "b": jnp.asarray(sd[prefix + ".bias"]),
        }

    def bn(prefix):
        return {
            "gamma": jnp.asarray(sd[prefix + ".weight"]),
            "beta": jnp.asarray(sd[prefix + ".bias"]),
            "mean": jnp.asarray(sd[prefix + ".running_mean"]),
            "var": jnp.asarray(sd[prefix + ".running_var"]),
        }

    params: Dict[str, Any] = {
        "layer0": conv("encoder.layer0"),
        "blocks": [],
        "classification": [
            conv("classification.0"),
            conv("classification.2"),
            conv("classification.4"),
        ],
        "sigma": jnp.asarray(sd["sigma"]).reshape(()),
    }
    for i in range(num_layers):
        pcn = f"encoder.blocks.PointCN_layer_{i}"
        nl = f"encoder.blocks.NonLocal_layer_{i}"
        params["blocks"].append(
            {
                "pointcn": {"dense": conv(f"{pcn}.0"), "bn": bn(f"{pcn}.1")},
                "q": conv(f"{nl}.projection_q"),
                "k": conv(f"{nl}.projection_k"),
                "v": conv(f"{nl}.projection_v"),
                "msg1": {"dense": conv(f"{nl}.fc_message.0"), "bn": bn(f"{nl}.fc_message.1")},
                "msg2": {"dense": conv(f"{nl}.fc_message.3"), "bn": bn(f"{nl}.fc_message.4")},
                "msg3": conv(f"{nl}.fc_message.6"),
            }
        )
    return params


class PointDSCModel:
    """Host-facing wrapper with the harness's `register(src, tgt)` interface."""

    def __init__(self, params: Optional[Dict[str, Any]] = None, seed: int = 0, max_corr: int = 10000):
        # Reference scale: `pointsdc_registration` feeds up to n_points=10000
        # correspondences (`registration_node.py:211-214`). The [N, N]
        # compatibility/attention matrices are 400 MB f32 at 10k — fine in HBM.
        if params is None:
            params = init_pointdsc_params(jax.random.PRNGKey(seed))
        self.params = params
        self.max_corr = max_corr

    @staticmethod
    def _bucket(n: int) -> int:
        """Pad to coarse buckets so shape-specialized jits are reused."""
        b = 512
        while b < n:
            b *= 2
        return b

    def register(self, src_keypts: np.ndarray, tgt_keypts: np.ndarray) -> np.ndarray:
        n = src_keypts.shape[0]
        if n > self.max_corr:
            idx = np.linspace(0, n - 1, self.max_corr).astype(int)
            src_keypts, tgt_keypts = src_keypts[idx], tgt_keypts[idx]
            n = self.max_corr
        corr_pos = np.c_[src_keypts, tgt_keypts]
        corr_pos = corr_pos - corr_pos.mean(0)  # `registration_node.py:218-219`
        nb = min(self._bucket(n), self.max_corr)
        pad = nb - n
        mask = np.zeros(nb, dtype=bool)
        mask[:n] = True
        corr_pos = np.pad(corr_pos, ((0, pad), (0, 0)))
        src_p = np.pad(src_keypts, ((0, pad), (0, 0)))
        tgt_p = np.pad(tgt_keypts, ((0, pad), (0, 0)))
        out = pointdsc_forward(
            self.params,
            jnp.asarray(corr_pos, dtype=jnp.float32),
            jnp.asarray(src_p, dtype=jnp.float32),
            jnp.asarray(tgt_p, dtype=jnp.float32),
            jnp.asarray(mask),
            # Seed count: the reference's num_corr * 0.1, rounded UP to a
            # multiple of 32 so shape-specialized jits are reused across close
            # n (extra seeds only add hypotheses).
            ratio_num=-(-max(n // 10, 1) // 32) * 32,
        )
        return np.asarray(out["final_trans"], dtype=np.float64)


_MODEL: Optional[PointDSCModel] = None


def get_pointdsc_model() -> PointDSCModel:
    """Weights from $VFMREG_POINTDSC_WEIGHTS (a torch state-dict file) or error."""
    global _MODEL
    if _MODEL is not None:
        return _MODEL
    path = os.environ.get("VFMREG_POINTDSC_WEIGHTS")
    if path and os.path.exists(path):
        import torch

        sd = torch.load(path, map_location="cpu")
        _MODEL = PointDSCModel(load_pointdsc_state_dict({k: v.numpy() for k, v in sd.items()}))
    else:
        raise FileNotFoundError(
            "PointDSC weights not found; set VFMREG_POINTDSC_WEIGHTS to the "
            "torch checkpoint (reference: pointdsc/model_best.pkl)"
        )
    return _MODEL
