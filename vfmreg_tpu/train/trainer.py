"""Descriptor-refinement training — the framework's training subsystem.

The reference is inference-only (SURVEY.md: "no model is trained"); this module
adds the natural trainable extension for production deployment: fine-tuning the
DINOv2 backbone plus a projection adapter with an in-batch contrastive
(InfoNCE) objective over corresponding patch descriptors of paired views — the
FCGF/GCL metric-learning recipe applied to the VFM descriptors that drive
registration recall.

Parallelism layout (the framework's multi-chip training path):
  * mesh ("data", "model");
  * dp: image batch sharded over "data";
  * tp: ViT attention q/k/v output dims, the MLP hidden dim, and the adapter
    hidden dim sharded over "model" (Megatron-style column/row splits — XLA
    GSPMD inserts the psum/all-gathers over ICI);
  * pp/sp/ep are intentionally not used: a 12-layer ViT-S fits per-chip, patch
    sequences are ~1.4k tokens, and there are no experts — dp x tp is the
    right decomposition at this scale (SURVEY.md §5).

Optimizer: optax adamw; the optimizer state inherits the parameter shardings.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vfmreg_tpu.models.vit import ViTConfig, init_vit_params, vit_forward


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    temperature: float = 0.07
    adapter_hidden: int = 512
    adapter_out: int = 128


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def init_adapter_params(key: jax.Array, d_in: int, cfg: TrainConfig) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    scale1 = (2.0 / d_in) ** 0.5
    scale2 = (2.0 / cfg.adapter_hidden) ** 0.5
    return {
        "fc1": {
            "w": jax.random.normal(k1, (d_in, cfg.adapter_hidden)) * scale1,
            "b": jnp.zeros((cfg.adapter_hidden,)),
        },
        "fc2": {
            "w": jax.random.normal(k2, (cfg.adapter_hidden, cfg.adapter_out)) * scale2,
            "b": jnp.zeros((cfg.adapter_out,)),
        },
    }


def _vit_param_spec(params: Dict[str, Any]) -> Dict[str, Any]:
    """Megatron-style tp layout for the ViT parameter pytree."""

    def block_spec(_):
        return {
            "norm1": {"scale": P(), "bias": P()},
            "q": {"w": P(None, "model"), "b": P("model")},
            "k": {"w": P(None, "model"), "b": P("model")},
            "v": {"w": P(None, "model"), "b": P("model")},
            "proj": {"w": P("model", None), "b": P()},
            "ls1": P(),
            "norm2": {"scale": P(), "bias": P()},
            "fc1": {"w": P(None, "model"), "b": P("model")},
            "fc2": {"w": P("model", None), "b": P()},
            "ls2": P(),
        }

    return {
        "patch_embed": {"w": P(), "b": P()},
        "cls_token": P(),
        "pos_embed": P(),
        "final_norm": {"scale": P(), "bias": P()},
        "blocks": [block_spec(b) for b in params["blocks"]],
    }


def _adapter_spec() -> Dict[str, Any]:
    return {
        "fc1": {"w": P(None, "model"), "b": P("model")},
        "fc2": {"w": P("model", None), "b": P()},
    }


def shard_vit_params(params: Dict[str, Any], adapter: Dict[str, Any], mesh: Mesh):
    """Place the parameter pytrees on the mesh with the tp layout."""
    spec = {"vit": _vit_param_spec(params), "adapter": _adapter_spec()}
    tree = {"vit": params, "adapter": adapter}

    def place(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(place, tree, spec), spec


def create_train_state(
    key: jax.Array, vit_cfg: ViTConfig, mesh: Mesh, cfg: TrainConfig = TrainConfig()
) -> Tuple[TrainState, Any, optax.GradientTransformation]:
    k1, k2 = jax.random.split(key)
    vit_params = init_vit_params(k1, vit_cfg)
    adapter = init_adapter_params(k2, vit_cfg.hidden_size, cfg)
    params, spec = shard_vit_params(vit_params, adapter, mesh)
    tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0)), spec, tx


def _adapter_forward(adapter, feats):
    h = jax.nn.gelu(feats @ adapter["fc1"]["w"] + adapter["fc1"]["b"])
    out = h @ adapter["fc2"]["w"] + adapter["fc2"]["b"]
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8)


def make_train_step(vit_cfg: ViTConfig, mesh: Mesh, cfg: TrainConfig = TrainConfig(), tx=None):
    """Returns a jitted dp+tp train step:
    (state, images_a, images_b, pix_idx) -> (state, metrics).

    images_a/b: [B, H, W, 3] two views of the same scenes (dp-sharded);
    pix_idx: [B, K] flattened patch indices of corresponding patches.
    InfoNCE over the K paired descriptors with in-batch negatives.
    """
    if tx is None:
        tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)

    def loss_fn(params, images_a, images_b, pix_idx):
        feats_a = vit_forward(params["vit"], images_a, vit_cfg)["patches"]
        feats_b = vit_forward(params["vit"], images_b, vit_cfg)["patches"]
        b, gh, gw, d = feats_a.shape
        fa = feats_a.reshape(b, gh * gw, d)
        fb = feats_b.reshape(b, gh * gw, d)
        za = _adapter_forward(params["adapter"], jnp.take_along_axis(fa, pix_idx[..., None], 1))
        zb = _adapter_forward(params["adapter"], jnp.take_along_axis(fb, pix_idx[..., None], 1))
        za = za.reshape(-1, za.shape[-1])  # [B*K, C]
        zb = zb.reshape(-1, zb.shape[-1])
        logits = za @ zb.T / cfg.temperature
        labels = jnp.arange(za.shape[0])
        loss = 0.5 * (
            optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            + optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
        )
        acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
        return loss, acc

    data_sharding = NamedSharding(mesh, P("data"))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images_a, images_b, pix_idx):
        images_a = jax.lax.with_sharding_constraint(images_a, data_sharding)
        images_b = jax.lax.with_sharding_constraint(images_b, data_sharding)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images_a, images_b, pix_idx
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    return train_step


# ----------------------------------------------------------- checkpoint/resume
def save_checkpoint(ckpt_dir, state: TrainState, step: int = None) -> str:
    """Orbax checkpoint of the full train state (resumable training — the
    reference has no run-state checkpointing, SURVEY.md §5)."""
    import orbax.checkpoint as ocp
    from pathlib import Path

    step = int(state.step) if step is None else int(step)
    path = Path(ckpt_dir).absolute() / f"step_{step:08d}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return str(path)


def restore_checkpoint(path, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    from pathlib import Path

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target)


def latest_checkpoint(ckpt_dir):
    from pathlib import Path

    steps = sorted(Path(ckpt_dir).glob("step_*"))
    return str(steps[-1]) if steps else None
