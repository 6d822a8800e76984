"""XD descriptor-weighted NN registration (reference `Registration.cpp:384-422`).

Pins the repo's XD path against a numpy oracle of the reference's XD
`GetCorrespondences` (`VoxelHashMap.cpp:320-455`): champion selection minimizes
`d2 * clamp(0.5*(1-cos), 0.01, 1.0)` when BOTH the query and the candidate
carry nonzero descriptor sums (`:360-384`); acceptance is plain Euclidean
(`:425-433` — only the cosine accept-gate is commented out upstream). The
weighting is LIVE in the XD path but disabled in the fixed-size Nd/VFM path
(`:246`, `if (n_features > 0 && false)`).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vfmreg_tpu.config import load_config
from vfmreg_tpu.kiss.mapping import VoxelHashMap, get_voxel_hash_map
from vfmreg_tpu.kiss.registration import register_frame
from vfmreg_tpu.ops.hash_grid import (
    build_hash_grid,
    nearest_neighbors,
    nearest_neighbors_xd,
)
from vfmreg_tpu.ops.voxel import bucket_size


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _oracle_xd_nn(map_pts, map_feats, queries, qfeats, voxel_size, cap=20):
    """Numpy oracle of the XD `GetClosestNeighbor` (`VoxelHashMap.cpp:360-404`).

    Returns (nbr [N,3], euclid_dist [N], found [N]). The per-voxel point cap
    keeps the FIRST `cap` points in insertion order (`VoxelHashMap.hpp:47-54`).
    """
    vox = np.trunc(np.asarray(map_pts, np.float64) / voxel_size).astype(np.int64)
    buckets = {}
    for i, key in enumerate(map(tuple, vox)):
        b = buckets.setdefault(key, [])
        if len(b) < cap:
            b.append(i)

    map_pts = np.asarray(map_pts, np.float64)
    map_feats = np.asarray(map_feats, np.float64)
    queries = np.asarray(queries, np.float64)
    qfeats = np.asarray(qfeats, np.float64)

    out_nbr = np.zeros((queries.shape[0], 3))
    out_dist = np.full(queries.shape[0], np.inf)
    out_found = np.zeros(queries.shape[0], dtype=bool)
    for qi, (q, qf) in enumerate(zip(queries, qfeats)):
        kx, ky, kz = np.trunc(q / voxel_size).astype(np.int64)
        q_has = qf.sum() != 0.0
        best_wd2, best = np.inf, None
        for i in range(kx - 1, kx + 2):
            for j in range(ky - 1, ky + 2):
                for k in range(kz - 1, kz + 2):
                    for idx in buckets.get((i, j, k), ()):
                        n, nf = map_pts[idx], map_feats[idx]
                        d2 = float(np.sum((n - q) ** 2))
                        w = 1.0
                        if q_has and nf.sum() != 0.0:
                            cos = nf @ qf / (
                                np.linalg.norm(nf) * np.linalg.norm(qf) + 1e-5
                            )
                            w = np.clip(0.5 * (1.0 - cos), 0.01, 1.0)
                        if d2 * w < best_wd2:
                            best_wd2, best = d2 * w, (n, np.sqrt(d2))
        if best is not None:
            out_nbr[qi], out_dist[qi] = best
            out_found[qi] = True
    return out_nbr, out_dist, out_found


def _padded_grid(pts, feats, voxel_size):
    n = bucket_size(pts.shape[0])
    P = np.zeros((n, 3), np.float32)
    P[: pts.shape[0]] = pts
    F = np.zeros((n, feats.shape[1]), np.float32)
    F[: pts.shape[0]] = feats
    mask = np.zeros(n, bool)
    mask[: pts.shape[0]] = True
    return build_hash_grid(
        jnp.asarray(P), voxel_size, mask=jnp.asarray(mask), feats=jnp.asarray(F)
    )


def _pad_queries(q, qf):
    n = bucket_size(q.shape[0])
    Q = np.zeros((n, 3), np.float32)
    Q[: q.shape[0]] = q
    QF = np.zeros((n, qf.shape[1]), np.float32)
    QF[: q.shape[0]] = qf
    mask = np.zeros(n, bool)
    mask[: q.shape[0]] = True
    return jnp.asarray(Q), jnp.asarray(QF), jnp.asarray(mask)


def test_weighted_and_unweighted_pick_different_champions():
    """A closer opposite-descriptor point loses to a farther same-descriptor
    point under the weighted metric (w=1 vs w=0.01) — the exact divergence the
    live XD metric introduces."""
    voxel = 5.0
    q = np.array([[1.0, 1.0, 1.0]], np.float32)
    f = np.array([1.0, 0.0], np.float32)
    # pA: 0.5 m away, cosine -1 (w=1); pB: 1.0 m away, cosine +1 (w=0.01).
    pts = np.array([[1.5, 1.0, 1.0], [2.0, 1.0, 1.0]], np.float32)
    feats = np.stack([-f, f])
    grid = _padded_grid(pts, feats, voxel)
    Q, QF, mask = _pad_queries(q, f[None])

    nbr_u, dist_u, found_u = nearest_neighbors(grid, Q, mask)
    nbr_w, dist_w, found_w = nearest_neighbors_xd(grid, Q, QF, mask)
    assert found_u[0] and found_w[0]
    np.testing.assert_allclose(np.asarray(nbr_u)[0], pts[0])  # unweighted: pA
    np.testing.assert_allclose(np.asarray(nbr_w)[0], pts[1])  # weighted: pB
    # Reported distance is the champion's EUCLIDEAN distance (accept gate).
    np.testing.assert_allclose(float(dist_w[0]), 1.0, atol=1e-6)

    o_nbr, o_dist, o_found = _oracle_xd_nn(pts, feats, q, f[None], voxel)
    np.testing.assert_allclose(np.asarray(nbr_w)[0], o_nbr[0], atol=1e-6)
    np.testing.assert_allclose(float(dist_w[0]), o_dist[0], atol=1e-6)


def test_xd_nn_matches_oracle_random(rng):
    """Randomized parity vs the numpy oracle, incl. zero-descriptor points on
    both sides (weight degenerates to 1.0, `VoxelHashMap.cpp:375`)."""
    D, voxel = 6, 2.0
    pts = rng.uniform(-10, 10, (600, 3)).astype(np.float32)
    feats = rng.normal(size=(600, D)).astype(np.float32)
    feats[rng.random(600) < 0.25] = 0.0  # descriptor-less map points
    q = rng.uniform(-10, 10, (128, 3)).astype(np.float32)
    qf = rng.normal(size=(128, D)).astype(np.float32)
    qf[rng.random(128) < 0.25] = 0.0  # descriptor-less queries

    grid = _padded_grid(pts, feats, voxel)
    Q, QF, mask = _pad_queries(q, qf)
    nbr, dist, found = nearest_neighbors_xd(grid, Q, QF, mask)
    nbr = np.asarray(nbr)[: q.shape[0]]
    dist = np.asarray(dist)[: q.shape[0]]
    found = np.asarray(found)[: q.shape[0]]

    o_nbr, o_dist, o_found = _oracle_xd_nn(pts, feats, q, qf, voxel)
    np.testing.assert_array_equal(found, o_found)
    np.testing.assert_allclose(nbr[found], o_nbr[found], atol=1e-5)
    np.testing.assert_allclose(dist[found], o_dist[found], atol=1e-5)
    # The weighting must actually change at least one champion vs unweighted.
    nbr_u, _, _ = nearest_neighbors(grid, Q, mask)
    assert np.any(np.abs(np.asarray(nbr_u)[: q.shape[0]][found] - nbr[found]) > 1e-6)


def test_mapping_get_correspondences_xd(rng):
    """`VoxelHashMap.get_correspondences(..., xd=True)` applies the weighted
    champion metric; the default keeps the Nd (unweighted) semantics."""
    m = VoxelHashMap(voxel_size=5.0, max_distance=100.0)
    q = np.array([[1.0, 1.0, 1.0]], np.float32)
    f = np.array([1.0, 0.0], np.float32)
    pts = np.array([[1.5, 1.0, 1.0], [2.0, 1.0, 1.0]], np.float32)
    feats = np.stack([-f, f])
    m.add_points(np.c_[pts, feats])
    src_xd, tgt_xd = m.get_correspondences(np.c_[q, f[None]], 3.0, xd=True)
    src_nd, tgt_nd = m.get_correspondences(np.c_[q, f[None]], 3.0)
    np.testing.assert_allclose(tgt_xd[0], pts[1])
    np.testing.assert_allclose(tgt_nd[0], pts[0])


def test_register_frame_xd_dispatch_recovers_pose(rng):
    """[N, 3+D] with D != vfm_descriptor_size routes XD (reference
    `registration.py:35-41` with `_point_size()`=384) and still recovers the
    pose through the weighted-NN GN loop."""
    from scipy.spatial.transform import Rotation as R

    config = load_config(None, deskew=False, max_range=100.0)
    pts = np.c_[
        rng.uniform(-30, 30, (1500, 2)), rng.uniform(0, 4, (1500, 1))
    ].astype(np.float32)
    W = rng.normal(size=(3, 8)).astype(np.float32)
    feats = np.sin(pts @ W * 0.15).astype(np.float32)
    m = get_voxel_hash_map(config)
    m.add_points(np.c_[pts, feats])

    T = np.eye(4)
    T[:3, :3] = R.from_euler("z", 3, degrees=True).as_matrix()
    T[:3, 3] = [0.6, -0.4, 0.1]
    scan = (pts - T[:3, 3]) @ T[:3, :3]
    pose = register_frame(
        np.c_[scan, feats], m, np.eye(4), 1.5, 0.5, vfm_descriptor_size=384
    )
    assert np.linalg.norm(pose[:3, 3] - T[:3, 3]) < 0.1
    # Same call WITHOUT the dispatch override takes the VFM path and returns
    # the (pose, src, tgt) tuple when sentinels are passed — unchanged.
    out = register_frame(
        np.c_[scan, feats], m, np.eye(4), 1.5, 0.5,
        src_=np.zeros((1, 3)), tgt_=np.zeros((1, 3)),
    )
    assert isinstance(out, tuple) and len(out) == 3
