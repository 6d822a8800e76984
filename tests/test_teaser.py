import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R
import pytest

from vfmreg_tpu.registration.teaser import teaser_registration


def make_corrs(rng, n=300, outlier_frac=0.5, noise=0.05):
    T = np.eye(4)
    T[:3, :3] = R.from_euler("xyz", rng.uniform(-60, 60, 3), degrees=True).as_matrix()
    T[:3, 3] = rng.uniform(-10, 10, 3)
    src = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    tgt = (src @ T[:3, :3].T + T[:3, 3] + rng.normal(0, noise, (n, 3))).astype(np.float32)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    tgt[out_idx] = rng.uniform(-25, 25, (n_out, 3))
    inlier = np.ones(n, dtype=bool)
    inlier[out_idx] = False
    return src, tgt, T, inlier


def _pose_errors(got, T):
    te = np.linalg.norm(got[:3, 3] - T[:3, 3])
    cos = np.clip((np.trace(got[:3, :3].T @ T[:3, :3]) - 1) / 2, -1, 1)
    return te, np.rad2deg(np.arccos(cos))


def test_teaser_clean(rng):
    src, tgt, T, _ = make_corrs(rng, outlier_frac=0.0, noise=0.01)
    res = teaser_registration(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(src.shape[0], dtype=bool), noise_bound=0.1
    )
    te, re = _pose_errors(np.asarray(res.pose), T)
    assert te < 0.1 and re < 1.0


def test_teaser_robust_to_half_outliers(rng):
    src, tgt, T, inlier = make_corrs(rng, outlier_frac=0.5, noise=0.05)
    res = teaser_registration(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(src.shape[0], dtype=bool), noise_bound=0.2
    )
    te, re = _pose_errors(np.asarray(res.pose), T)
    assert te < 0.5 and re < 3.0
    # The selected clique must be NON-EMPTY and mostly true inliers (an empty
    # clique would mean the selection broke while GNC limped to a pose).
    clique = np.asarray(res.inlier_mask)
    assert clique.sum() > 0
    assert (inlier[clique].mean()) > 0.8


def test_teaser_respects_mask(rng):
    src, tgt, T, _ = make_corrs(rng, outlier_frac=0.0, noise=0.01)
    # poison masked-out rows
    tgt2 = tgt.copy()
    tgt2[:100] = 1e3
    mask = np.ones(src.shape[0], dtype=bool)
    mask[:100] = False
    res = teaser_registration(
        jnp.asarray(src), jnp.asarray(tgt2), jnp.asarray(mask), noise_bound=0.1
    )
    te, re = _pose_errors(np.asarray(res.pose), T)
    assert te < 0.2 and re < 1.5


def test_max_clique_exact_on_adversarial_graphs(rng):
    """Bitset branch-and-bound == brute force on random graphs, and finds the
    planted clique where greedy peeling can be misled."""
    import itertools

    from vfmreg_tpu.registration.max_clique import max_clique

    # Random graphs vs brute force.
    for trial in range(5):
        n = 14
        a = rng.rand(n, n) < 0.5
        a = a | a.T
        np.fill_diagonal(a, False)
        got = max_clique(a)
        # brute force
        best = 1
        for k in range(n, 0, -1):
            found = False
            for comb in itertools.combinations(range(n), k):
                sub = a[np.ix_(comb, comb)]
                if np.all(sub | np.eye(k, dtype=bool)):
                    best, found = k, True
                    break
            if found:
                break
        assert got.sum() == best
        sub = a[np.ix_(np.flatnonzero(got), np.flatnonzero(got))]
        assert np.all(sub | np.eye(int(got.sum()), dtype=bool))

    # Planted 12-clique hidden among high-degree decoys: decoy hub nodes have
    # MORE neighbors than clique members but no large clique among them.
    n = 80
    a = np.zeros((n, n), dtype=bool)
    clique_nodes = np.arange(12)
    a[np.ix_(clique_nodes, clique_nodes)] = True
    hubs = np.arange(12, 20)
    for h in hubs:  # hubs connect to many scattered nodes (bipartite-ish)
        others = rng.choice(np.arange(20, n), 40, replace=False)
        a[h, others] = True
        a[others, h] = True
    a = a | a.T
    np.fill_diagonal(a, False)
    got = max_clique(a)
    assert got.sum() == 12 and np.all(np.flatnonzero(got) == clique_nodes)


def _outlier_problem(rng, n, outlier_frac, noise=0.01):
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("zyx", [35, 10, -5], degrees=True).as_matrix().astype(np.float32)
    t = np.array([2.0, -1.0, 0.5], np.float32)
    src = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    tgt = src @ R.T + t + rng.normal(0, noise, (n, 3)).astype(np.float32)
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    tgt[idx] = rng.uniform(-8, 8, (n_out, 3)).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    return src, tgt, T


@pytest.mark.parametrize("outlier_frac", [0.7, 0.8, 0.9])
def test_teaser_exact_high_outlier_rates(rng, outlier_frac):
    """Exact-clique TEASER recovers the pose at 70/80/90% outliers
    (reference config: PMC_EXACT + GNC_TLS, `registration_node.py:112-127`)."""
    from vfmreg_tpu.registration.teaser import teaser_registration_exact

    src, tgt, T = _outlier_problem(rng, 200, outlier_frac)
    res = teaser_registration_exact(src, tgt, np.ones(len(src), bool), noise_bound=0.05)
    pose = np.asarray(res.pose)
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(pose[:3, :3].T @ T[:3, :3]) - 1) / 2, -1, 1))
    )
    t_err = np.linalg.norm(pose[:3, 3] - T[:3, 3])
    assert rot_err < 1.0, rot_err
    assert t_err < 0.1, t_err
    # The selected inliers are (mostly) true inliers.
    inl = np.asarray(res.inlier_mask)
    moved = src[inl] @ T[:3, :3].T + T[:3, 3]
    assert np.median(np.linalg.norm(moved - tgt[inl], axis=-1)) < 0.05


def test_scalar_tls_adaptive_voting(rng):
    """Exact scalar TLS: consensus window wins against 60% gross outliers."""
    from vfmreg_tpu.registration.teaser import _scalar_tls

    v = np.full(100, 3.0) + rng.normal(0, 0.01, 100)
    v[:60] = rng.uniform(-50, 50, 60)
    got = float(_scalar_tls(jnp.asarray(v.astype(np.float32)),
                            jnp.ones(100, bool), jnp.float32(0.05), jnp.float32(1.0)))
    assert abs(got - 3.0) < 0.02
