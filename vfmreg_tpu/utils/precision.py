"""Matmul-precision control for the registration core.

TPU MXU f32 matmuls run bf16 passes at the DEFAULT precision: at LiDAR map
coordinates (|p| ~ 100 m) a single `points @ R.T` then carries up to ~0.5 m of
rounding (measured on v5e) — most of the paper's 0.6 m recall budget. The
geometry/registration pipeline therefore traces under
`jax.default_matmul_precision("highest")` (true f32, ~1e-5 m at 100 m); the
throughput-critical bulk matmuls (ViT, cosine matching, sparse conv) keep the
fast default, which robust estimators downstream absorb.
"""

from __future__ import annotations

import functools

import jax


def full_precision(fn):
    """Trace `fn` under full-f32 matmul precision (TPU: no bf16 passes)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
