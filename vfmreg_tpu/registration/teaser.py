"""TEASER-style certifiable-robust registration: max-clique inlier selection +
GNC-TLS rotation + component-wise TLS translation.

Replaces `teaser.RobustRegistrationSolver` as configured at
`registration_node.py:112-127`: cbar2=1, noise_bound=0.2, no scale estimation,
PMC max-clique inlier selection, CHAIN rotation TIM graph, GNC-TLS rotation
(factor 1.4, <=10000 iters, cost threshold 1e-16).

TPU-first differences:
  * the pairwise consistency graph is a dense [N, N] boolean matmul-shaped
    computation (subsampled to <= `max_graph_nodes` correspondences);
  * PMC's exact branch-and-bound max clique is replaced by k-core peeling plus
    greedy expansion restarted from the highest-degree seeds — a standard
    heuristic whose cliques are near-maximum on registration consistency graphs
    (exact PMC is NP-hard and serial; divergence documented here);
  * GNC-TLS runs as a fixed-shape `lax.while_loop` with vmapped closed-form
    rotation updates (Kabsch on weighted TIMs).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vfmreg_tpu.utils.precision import full_precision

from vfmreg_tpu.registration.procrustes import weighted_kabsch


class TeaserResult(NamedTuple):
    pose: jnp.ndarray  # [4, 4]
    inlier_mask: jnp.ndarray  # [N] clique membership
    rotation_weights: jnp.ndarray  # [M] final TLS weights over TIMs


def _consistency_graph(src, tgt, mask, noise_bound, cbar2):
    """A[i,j] = 1 iff | |src_i-src_j| - |tgt_i-tgt_j| | <= 2 * noise_bound * sqrt(cbar2)."""
    d_src = jnp.linalg.norm(src[:, None, :] - src[None, :, :], axis=-1)
    d_tgt = jnp.linalg.norm(tgt[:, None, :] - tgt[None, :, :], axis=-1)
    ok = jnp.abs(d_src - d_tgt) <= 2.0 * noise_bound * jnp.sqrt(cbar2)
    ok = ok & mask[:, None] & mask[None, :]
    n = src.shape[0]
    return ok & ~jnp.eye(n, dtype=bool)


def _greedy_clique(adj: jnp.ndarray, n_restarts: int = 8) -> jnp.ndarray:
    """k-core peel + greedy expansion from top-degree seeds. Returns bool [N]."""
    n = adj.shape[0]

    # k-core peeling: iteratively drop minimum-degree nodes below the current
    # best clique bound — here simplified to a fixed number of peel rounds that
    # removes nodes whose degree is below half the max degree.
    def peel(_, alive):
        deg = jnp.sum(adj & alive[None, :], axis=1) * alive
        thresh = jnp.maximum(jnp.max(deg) // 2, 1)
        return jnp.where(deg >= thresh, alive, False)

    alive = jax.lax.fori_loop(0, 3, peel, jnp.ones((n,), dtype=bool))

    deg = jnp.sum(adj & alive[None, :], axis=1) * alive
    seeds = jnp.argsort(-deg)[:n_restarts]

    def grow(seed):
        member = jnp.zeros((n,), dtype=bool).at[seed].set(True)
        # candidates: adjacent to all members
        def body(_, state):
            member, cand = state
            # pick highest-degree candidate
            cand_deg = jnp.sum(adj & cand[None, :], axis=1) * cand
            nxt = jnp.argmax(jnp.where(cand, cand_deg + 1, 0))
            has = cand[nxt]
            member = member.at[nxt].set(member[nxt] | has)
            # Narrow candidates to the new member's neighborhood; empty when done.
            cand = jnp.where(has, cand & adj[nxt], jnp.zeros_like(cand))
            return member, cand

        cand = adj[seed] & alive
        member, _ = jax.lax.fori_loop(0, n, body, (member, cand))
        return member

    cliques = jax.vmap(grow)(seeds)
    sizes = jnp.sum(cliques, axis=1)
    return cliques[jnp.argmax(sizes)]


def _gnc_tls_rotation(a, b, w_mask, noise_bound, cbar2, gnc_factor, max_iters, cost_threshold):
    """GNC-TLS rotation over TIM pairs: min_R sum min(|b - R a|^2 / eps^2, cbar2)."""
    eps2 = jnp.maximum(noise_bound * noise_bound, 1e-12)

    def residual2(R):
        return jnp.sum((b - a @ R.T) ** 2, axis=-1)

    # Initialize mu from max residual (Yang et al. 2020, eq. 14 style).
    R0 = weighted_kabsch(a, b, w_mask.astype(jnp.float32))[:3, :3]
    r2_max = jnp.max(jnp.where(w_mask, residual2(R0), 0.0))
    mu0 = 1.0 / (2.0 * r2_max / (cbar2 * eps2) - 1.0)
    mu0 = jnp.where((mu0 > 0) & jnp.isfinite(mu0), mu0, 1e-3)

    def cond(state):
        _, _, mu, it, prev_cost, cost = state
        return (it < max_iters) & (jnp.abs(cost - prev_cost) > cost_threshold)

    def body(state):
        R, w, mu, it, _, prev_cost = state
        r2 = residual2(R)
        ub = (mu + 1.0) / mu * cbar2 * eps2
        lb = mu / (mu + 1.0) * cbar2 * eps2
        w_new = jnp.where(
            r2 >= ub,
            0.0,
            jnp.where(r2 <= lb, 1.0, jnp.sqrt(cbar2 * eps2 * mu * (mu + 1.0) / r2) - mu),
        )
        w_new = jnp.clip(w_new, 0.0, 1.0) * w_mask
        R_new = weighted_kabsch(a, b, w_new)[:3, :3]
        cost = jnp.sum(w_new * residual2(R_new))
        return (R_new, w_new, mu * gnc_factor, it + 1, prev_cost, cost)

    init = (R0, w_mask.astype(jnp.float32), mu0, jnp.int32(0), jnp.float32(jnp.inf), jnp.float32(0.0))
    R, w, *_ = jax.lax.while_loop(cond, body, init)
    return R, w


def _tls_translation(residuals, w_mask, noise_bound):
    """Component-wise truncated estimate: median of inlier-window values.

    TEASER solves scalar TLS per axis; the median over the accepted window is its
    robust equivalent at these sizes.
    """
    from vfmreg_tpu.ops.matching import masked_median

    out = []
    for k in range(3):
        v = residuals[:, k]
        med = masked_median(v, w_mask)
        keep = w_mask & (jnp.abs(v - med) <= noise_bound)
        out.append(masked_median(v, keep))
    return jnp.stack(out)


@partial(jax.jit, static_argnames=("max_graph_nodes", "max_iters"))
@full_precision
def teaser_registration(
    src: jnp.ndarray,  # [N, 3]
    tgt: jnp.ndarray,  # [N, 3]
    mask: jnp.ndarray,  # [N]
    noise_bound=0.2,
    cbar2=1.0,
    gnc_factor=1.4,
    max_iters: int = 100,
    cost_threshold=1e-16,
    max_graph_nodes: int = 512,
) -> TeaserResult:
    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)

    # Subsample to the graph budget (front-compacted valid rows first).
    order = jnp.argsort(~mask, stable=True)
    src_s, tgt_s, mask_s = src[order], tgt[order], mask[order]
    src_s, tgt_s, mask_s = src_s[:max_graph_nodes], tgt_s[:max_graph_nodes], mask_s[:max_graph_nodes]

    adj = _consistency_graph(src_s, tgt_s, mask_s, noise_bound, cbar2)
    clique = _greedy_clique(adj) & mask_s

    # CHAIN TIMs over the clique (consecutive differences of compacted members).
    corder = jnp.argsort(~clique, stable=True)
    csrc, ctgt, cmask = src_s[corder], tgt_s[corder], clique[corder]
    a = csrc[1:] - csrc[:-1]
    b = ctgt[1:] - ctgt[:-1]
    tim_mask = cmask[1:] & cmask[:-1]

    R, w = _gnc_tls_rotation(a, b, tim_mask, noise_bound, cbar2, gnc_factor, max_iters, cost_threshold)

    t = _tls_translation(ctgt - csrc @ R.T, cmask, noise_bound)

    pose = jnp.eye(4, dtype=jnp.float32)
    pose = pose.at[:3, :3].set(R)
    pose = pose.at[:3, 3].set(t)

    inlier_full = jnp.zeros_like(mask).at[order[:max_graph_nodes]].set(clique)
    return TeaserResult(pose=pose, inlier_mask=inlier_full, rotation_weights=w)
