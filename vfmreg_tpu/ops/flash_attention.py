"""Flash attention (non-causal, full bidirectional) as a Pallas TPU kernel.

Used by the ViT backbone over image patch tokens (seq len ~300-1400 for the
surround-view camera crops — batch/data parallelism is the scaling axis, not
sequence parallelism; see SURVEY.md §5 "long-context" note).

Streaming-softmax single pass: for each query block, iterate over key blocks
keeping running (max, sum, weighted-V) accumulators in VMEM scratch. Falls back
to an einsum softmax path off-TPU (and in tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_len: int, scale: float):
    # q_ref: [1, block_q, hd]; k_ref/v_ref: [1, T_pad, hd]; o_ref: [1, block_q, hd]
    block_q, hd = q_ref.shape[1], q_ref.shape[2]
    t_pad = k_ref.shape[1]
    num_k = t_pad // block_k

    q = q_ref[0].astype(jnp.float32) * scale

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk]
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + i * block_k
        s = jnp.where(col < seq_len, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, hd), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,  # [B, T, H, hd]
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full (non-causal) attention; returns [B, T, H, hd]."""
    b, t, h, hd = q.shape
    scale = 1.0 / math.sqrt(hd)

    t_pad = ((t + block_q - 1) // block_q) * block_q
    t_pad = ((t_pad + block_k - 1) // block_k) * block_k

    def prep(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, t, hd)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    grid = (b * h, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, seq_len=t, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :t].reshape(b, h, t, hd)
    return jnp.swapaxes(out, 1, 2)


def reference_attention(q, k, v):
    """einsum softmax attention, same signature — the correctness oracle."""
    hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
