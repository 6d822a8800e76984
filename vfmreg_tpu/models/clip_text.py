"""CLIP text tower in JAX: BPE tokenizer + causal transformer encoder.

Completes the MaskCLIP path of `ImageFeatureGenerator.compute_similarity`
(reference `vfm_reg/image_features.py:194-208`): the reference calls CLIP's
`tokenize(prompt)` and `encode_text(tokens)`; this module provides both
natively so a prompt string can be scored against per-point CLIP descriptors
without torch.

Tokenizer: OpenAI CLIP's SimpleTokenizer semantics — byte-level unicode
mapping, lowercasing, the CLIP word regex, BPE merges with the trailing
`</w>` convention, `<|startoftext|>`/`<|endoftext|>` wrapping, context length
77 with zero padding and truncation (ftfy's text fixing is skipped: prompts in
the harness are plain ASCII). The merge table loads from the standard
`bpe_simple_vocab_16e6.txt.gz`, vendored at `data/clip/` like the reference
vendors it at `src/featup_data/` (a dataset artifact; also fetchable via
`pipeline.download_models`).

Text encoder: token embed + positional embed -> width-W pre-LN transformer
with QuickGELU MLPs and a causal mask -> ln_final -> the end-of-text token's
features @ text_projection (OpenAI `CLIP.encode_text`).
"""

from __future__ import annotations

import dataclasses
import gzip
import html
import math
import re
from functools import lru_cache, partial
from pathlib import Path
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

CONTEXT_LENGTH = 77

# Vendored merge table (repo-root data/clip/, mirroring the reference's
# src/featup_data/bpe_simple_vocab_16e6.txt.gz).
DEFAULT_BPE_PATH = (
    Path(__file__).resolve().parents[2] / "data" / "clip" / "bpe_simple_vocab_16e6.txt.gz"
)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 512
    num_layers: int = 12
    num_heads: int = 8
    embed_dim: int = 512
    context_length: int = CONTEXT_LENGTH


# ----------------------------------------------------------------- tokenizer
@lru_cache()
def bytes_to_unicode():
    """Reversible byte -> printable-unicode table (GPT-2/CLIP convention)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("\xa1"), ord("\xac") + 1)) + list(range(ord("\xae"), ord("\xff") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _pairs(word):
    return set(zip(word[:-1], word[1:]))


_WORD_RE = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""".replace(
        r"[\p{L}]+", "[a-zA-Z]+"
    ).replace(r"[\p{N}]", "[0-9]").replace(r"[^\s\p{L}\p{N}]+", r"[^\sa-zA-Z0-9]+"),
    re.IGNORECASE,
)


class SimpleTokenizer:
    """CLIP BPE tokenizer over a merges table.

    `merges` is the decoded list of merge lines (as in
    bpe_simple_vocab_16e6.txt.gz rows 1..49152-256-2+1); pass `bpe_path` to
    load the standard gzip instead. With neither, the vendored table at
    `data/clip/bpe_simple_vocab_16e6.txt.gz` (repo root) is used.
    """

    def __init__(self, bpe_path: str = None, merges: List[str] = None):
        self.byte_encoder = bytes_to_unicode()
        if merges is None and bpe_path is None:
            bpe_path = DEFAULT_BPE_PATH
            if not bpe_path.exists():
                raise FileNotFoundError(
                    f"CLIP BPE merge table not found at {bpe_path}; pass "
                    "bpe_path/merges or fetch it with vfmreg-download-models"
                )
        if merges is None:
            with gzip.open(bpe_path, "rt", encoding="utf8") as f:
                merges = f.read().split("\n")
            merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word, i = [], 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text).strip().lower()
        ids: List[int] = []
        for token in _WORD_RE.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def tokenize(self, texts, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
        """[B, 77] int32 token matrix (`clip.tokenize` semantics: SOT + BPE +
        EOT, zero-padded, hard-truncated keeping the EOT)."""
        if isinstance(texts, str):
            texts = [texts]
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            tokens = [sot] + self.encode(text) + [eot]
            if len(tokens) > context_length:
                tokens = tokens[: context_length - 1] + [eot]
            out[i, : len(tokens)] = tokens
        return out


# --------------------------------------------------------------- text tower
def _ln(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def init_clip_text_params(key: jax.Array, cfg: CLIPTextConfig) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))
    w = cfg.width

    def dense(n_in, n_out):
        return {
            "w": jax.random.normal(next(ks), (n_in, n_out)) * (n_in**-0.5),
            "b": jnp.zeros((n_out,)),
        }

    def ln():
        return {"gamma": jnp.ones((w,)), "beta": jnp.zeros((w,))}

    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append(
            {
                "ln_1": ln(),
                "qkv": dense(w, 3 * w),
                "out": dense(w, w),
                "ln_2": ln(),
                "fc": dense(w, 4 * w),
                "proj": dense(4 * w, w),
            }
        )
    return {
        "token_embedding": jax.random.normal(next(ks), (cfg.vocab_size, w)) * 0.02,
        "positional_embedding": jax.random.normal(next(ks), (cfg.context_length, w)) * 0.01,
        "blocks": blocks,
        "ln_final": ln(),
        "text_projection": jax.random.normal(next(ks), (w, cfg.embed_dim)) * (w**-0.5),
    }


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@partial(jax.jit, static_argnames=("cfg",))
def clip_text_forward(params: Dict[str, Any], tokens: jnp.ndarray, cfg: CLIPTextConfig) -> jnp.ndarray:
    """[B, L] int tokens -> [B, embed_dim] text embeddings (`CLIP.encode_text`)."""
    b, L = tokens.shape
    x = params["token_embedding"][tokens] + params["positional_embedding"][:L]
    h = cfg.num_heads
    d = cfg.width // h
    causal = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)

    for blk in params["blocks"]:
        y = _ln(x, blk["ln_1"])
        qkv = y @ blk["qkv"]["w"] + blk["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, L, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, L, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, L, h, d).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d) + causal
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(b, L, -1)
        x = x + (y @ blk["out"]["w"] + blk["out"]["b"])
        y = _ln(x, blk["ln_2"])
        y = _quick_gelu(y @ blk["fc"]["w"] + blk["fc"]["b"])
        x = x + (y @ blk["proj"]["w"] + blk["proj"]["b"])

    x = _ln(x, params["ln_final"])
    eot = jnp.argmax(tokens, axis=-1)
    pooled = x[jnp.arange(b), eot]
    return pooled @ params["text_projection"]


def load_clip_text_state_dict(state_dict: Dict[str, np.ndarray], cfg: CLIPTextConfig) -> Dict[str, Any]:
    """Converter from the OpenAI CLIP state dict (`transformer.resblocks.*`,
    torch [out, in] linears -> [in, out])."""
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("model."):] if k.startswith("model.") else k] = np.asarray(v)

    def t(name):
        return jnp.asarray(sd[name].T)

    def ln(prefix):
        return {"gamma": jnp.asarray(sd[prefix + ".weight"]), "beta": jnp.asarray(sd[prefix + ".bias"])}

    blocks = []
    for i in range(cfg.num_layers):
        p = f"transformer.resblocks.{i}"
        blocks.append(
            {
                "ln_1": ln(p + ".ln_1"),
                "qkv": {"w": t(p + ".attn.in_proj_weight"), "b": jnp.asarray(sd[p + ".attn.in_proj_bias"])},
                "out": {"w": t(p + ".attn.out_proj.weight"), "b": jnp.asarray(sd[p + ".attn.out_proj.bias"])},
                "ln_2": ln(p + ".ln_2"),
                "fc": {"w": t(p + ".mlp.c_fc.weight"), "b": jnp.asarray(sd[p + ".mlp.c_fc.bias"])},
                "proj": {"w": t(p + ".mlp.c_proj.weight"), "b": jnp.asarray(sd[p + ".mlp.c_proj.bias"])},
            }
        )
    return {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "blocks": blocks,
        "ln_final": ln("ln_final"),
        "text_projection": jnp.asarray(sd["text_projection"]),
    }
