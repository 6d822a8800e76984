"""TEASER-style certifiable-robust registration: max-clique inlier selection +
GNC-TLS rotation + component-wise TLS translation.

Replaces `teaser.RobustRegistrationSolver` as configured at
`registration_node.py:112-127`: cbar2=1, noise_bound=0.2, no scale estimation,
PMC max-clique inlier selection, CHAIN rotation TIM graph, GNC-TLS rotation
(factor 1.4, <=10000 iters, cost threshold 1e-16).

TPU-first design:
  * the pairwise consistency graph is a dense [N, N] boolean matmul-shaped
    computation (subsampled to <= `max_graph_nodes` correspondences);
  * TWO inlier-selection paths: `teaser_registration` (fully jitted, k-core
    peel + greedy clique expansion — fast, device-only) and
    `teaser_registration_exact` (the reference-faithful path: EXACT maximum
    clique by host-side bitset branch-and-bound, `registration.max_clique`,
    matching PMC_EXACT; the solve still runs jitted). The harness uses the
    exact path;
  * GNC-TLS rotation runs as a fixed-shape `lax.while_loop` with closed-form
    weighted-Kabsch updates on CHAIN TIMs; translation is exact per-axis
    scalar TLS by adaptive voting (`_scalar_tls`).
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


def _scalar_tls(v, w_mask, beta, cbar2):
    """Exact scalar TLS by adaptive voting (TEASER's `solveForTranslation` /
    Yang & Carlone component-wise translation):
      min_t sum_i min((v_i - t)^2 / beta^2, cbar2).
    The optimum's consensus set is delimited by the 2N boundaries v_i -+
    beta*sqrt(cbar2); evaluate the truncated cost at the inlier-mean of every
    boundary-interval midpoint and take the argmin."""
    half = beta * jnp.sqrt(cbar2)
    big = jnp.float32(1e30)
    vv = jnp.where(w_mask, v, big)
    bounds = jnp.sort(jnp.concatenate([vv - half, vv + half]))
    mids = 0.5 * (bounds[1:] + bounds[:-1])  # [2N-1] candidate windows

    inl = w_mask[None, :] & (jnp.abs(v[None, :] - mids[:, None]) <= half)  # [C, N]
    cnt = jnp.maximum(jnp.sum(inl, axis=1), 1)
    est = jnp.sum(jnp.where(inl, v[None, :], 0.0), axis=1) / cnt  # consensus mean

    r2 = jnp.square(v[None, :] - est[:, None]) / jnp.square(beta)
    cost = jnp.sum(
        jnp.where(w_mask[None, :], jnp.where(inl, r2, cbar2), 0.0), axis=1
    )
    valid = jnp.isfinite(mids) & (jnp.abs(mids) < big / 2)
    cost = jnp.where(valid, cost, jnp.inf)
    return est[jnp.argmin(cost)]


def _tls_translation(residuals, w_mask, noise_bound, cbar2=1.0):
    """Component-wise scalar TLS (`registration_node.py:112-127` solver config;
    TEASER estimates each translation axis by exact adaptive voting)."""
    return jnp.stack(
        [_scalar_tls(residuals[:, k], w_mask, noise_bound, cbar2) for k in range(3)]
    )


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

    pose, w = _solve_on_clique(
        src_s, tgt_s, clique, noise_bound, cbar2, gnc_factor, max_iters, cost_threshold
    )
    inlier_full = jnp.zeros_like(mask).at[order[:max_graph_nodes]].set(clique)
    return TeaserResult(pose=pose, inlier_mask=inlier_full, rotation_weights=w)


def _solve_on_clique(src_s, tgt_s, clique, noise_bound, cbar2, gnc_factor, max_iters, cost_threshold):
    """GNC-TLS rotation + component-wise TLS translation over a clique mask."""
    # CHAIN TIMs over the clique (consecutive differences of compacted members).
    corder = jnp.argsort(~clique, stable=True)
    csrc, ctgt, cmask = src_s[corder], tgt_s[corder], clique[corder]
    a = csrc[1:] - csrc[:-1]
    b = ctgt[1:] - ctgt[:-1]
    tim_mask = cmask[1:] & cmask[:-1]

    R, w = _gnc_tls_rotation(a, b, tim_mask, noise_bound, cbar2, gnc_factor, max_iters, cost_threshold)

    t = _tls_translation(ctgt - csrc @ R.T, cmask, noise_bound, cbar2)

    pose = jnp.eye(4, dtype=jnp.float32)
    pose = pose.at[:3, :3].set(R)
    pose = pose.at[:3, 3].set(t)
    return pose, w


@partial(jax.jit, static_argnames=("max_iters",))
@full_precision
def _teaser_solve_jit(src_s, tgt_s, clique, noise_bound, cbar2, gnc_factor, max_iters, cost_threshold):
    return _solve_on_clique(
        src_s.astype(jnp.float32), tgt_s.astype(jnp.float32), clique,
        noise_bound, cbar2, gnc_factor, max_iters, cost_threshold,
    )


def teaser_registration_exact(
    src,
    tgt,
    mask,
    noise_bound=0.2,
    cbar2=1.0,
    gnc_factor=1.4,
    max_iters: int = 100,
    cost_threshold=1e-16,
    max_graph_nodes: int = 512,
) -> TeaserResult:
    """TEASER with the reference's EXACT max-clique inlier selection.

    The consistency graph is computed in numpy, the maximum clique by bitset
    branch-and-bound (`registration.max_clique`, the PMC_EXACT equivalent of
    `registration_node.py:117`), and the GNC-TLS/TLS solve runs jitted on the
    clique. Host entry point (the clique search is inherently serial)."""
    import numpy as np

    from vfmreg_tpu.registration.max_clique import max_clique

    src = np.asarray(src, dtype=np.float32)
    tgt = np.asarray(tgt, dtype=np.float32)
    mask = np.asarray(mask, dtype=bool)
    order = np.argsort(~mask, kind="stable")
    sel = order[:max_graph_nodes]
    src_s, tgt_s, mask_s = src[sel], tgt[sel], mask[sel]

    d_src = np.linalg.norm(src_s[:, None, :] - src_s[None, :, :], axis=-1)
    d_tgt = np.linalg.norm(tgt_s[:, None, :] - tgt_s[None, :, :], axis=-1)
    adj = np.abs(d_src - d_tgt) <= 2.0 * noise_bound * np.sqrt(cbar2)
    adj &= mask_s[:, None] & mask_s[None, :]
    np.fill_diagonal(adj, False)

    clique = max_clique(adj) & mask_s
    pose, w = _teaser_solve_jit(
        jnp.asarray(src_s), jnp.asarray(tgt_s), jnp.asarray(clique),
        jnp.float32(noise_bound), jnp.float32(cbar2), jnp.float32(gnc_factor),
        max_iters, jnp.float32(cost_threshold),
    )
    inlier_full = np.zeros_like(mask)
    inlier_full[sel] = clique
    return TeaserResult(pose=pose, inlier_mask=jnp.asarray(inlier_full), rotation_weights=w)
