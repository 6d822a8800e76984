import numpy as np
import pytest
import jax.numpy as jnp

from vfmreg_tpu.ops.hash_grid import build_hash_grid, nearest_neighbors, export_pointcloud


def brute_force_27_nn(map_pts, queries, voxel_size, max_per_voxel=20):
    """Reference semantics of VoxelHashMap::GetCorrespondences
    (`VoxelHashMap.cpp:76-134`): insertion-order cap per voxel, 27-voxel scan."""
    from collections import defaultdict

    buckets = defaultdict(list)
    for p in map_pts:
        key = tuple(np.trunc(p / voxel_size).astype(np.int64))
        if len(buckets[key]) < max_per_voxel:
            buckets[key].append(p)

    out_pt, out_d, out_found = [], [], []
    for q in queries:
        base = np.trunc(q / voxel_size).astype(np.int64)
        best, best_d2 = None, np.inf
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for dk in (-1, 0, 1):
                    key = (base[0] + di, base[1] + dj, base[2] + dk)
                    for p in buckets.get(key, []):
                        d2 = float(np.sum((p - q) ** 2))
                        if d2 < best_d2:
                            best, best_d2 = p, d2
        if best is None:
            out_pt.append(np.zeros(3))
            out_d.append(np.inf)
            out_found.append(False)
        else:
            out_pt.append(best)
            out_d.append(np.sqrt(best_d2))
            out_found.append(True)
    return np.stack(out_pt), np.asarray(out_d), np.asarray(out_found)


def test_nearest_neighbors_matches_bruteforce(rng):
    map_pts = rng.uniform(-10, 10, (800, 3)).astype(np.float32)
    queries = rng.uniform(-12, 12, (200, 3)).astype(np.float32)
    vs = 1.0
    grid = build_hash_grid(jnp.asarray(map_pts), vs)
    nbr, dist, found = nearest_neighbors(grid, jnp.asarray(queries))
    ref_pt, ref_d, ref_found = brute_force_27_nn(map_pts, queries, vs)

    np.testing.assert_array_equal(np.asarray(found), ref_found)
    got_d = np.asarray(dist)
    np.testing.assert_allclose(got_d[ref_found], ref_d[ref_found], atol=1e-4)
    np.testing.assert_allclose(np.asarray(nbr)[ref_found], ref_pt[ref_found], atol=1e-4)


def test_max_points_per_voxel_cap(rng):
    # 100 points in one voxel: only the first 20 (insertion order) are stored.
    pts = (0.5 + 0.4 * rng.uniform(-1, 1, (100, 3))).astype(np.float32)
    grid = build_hash_grid(jnp.asarray(pts), 1.0, max_points_per_voxel=20)
    stored_pts, _, valid = export_pointcloud(grid)
    got = np.asarray(stored_pts)[np.asarray(valid)]
    assert got.shape[0] == 20
    ref = pts[:20]
    got_set = {tuple(np.round(p, 5)) for p in got}
    ref_set = {tuple(np.round(p, 5)) for p in ref}
    assert got_set == ref_set


def test_empty_neighborhood(rng):
    map_pts = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    queries = np.asarray([[100.0, 100.0, 100.0]], dtype=np.float32)
    grid = build_hash_grid(jnp.asarray(map_pts), 1.0)
    _, dist, found = nearest_neighbors(grid, jnp.asarray(queries))
    assert not bool(found[0])
    assert np.isinf(float(dist[0]))


def test_query_mask(rng):
    map_pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    queries = rng.uniform(-5, 5, (10, 3)).astype(np.float32)
    qmask = np.zeros(10, dtype=bool)
    qmask[:5] = True
    grid = build_hash_grid(jnp.asarray(map_pts), 1.0)
    _, _, found = nearest_neighbors(grid, jnp.asarray(queries), jnp.asarray(qmask))
    assert not np.any(np.asarray(found)[5:])


def test_build_with_masked_points(rng):
    pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    mask = np.zeros(100, dtype=bool)
    mask[:30] = True
    grid = build_hash_grid(jnp.asarray(pts), 1.0, mask=jnp.asarray(mask))
    assert int(grid.num_points) == 30  # every valid point stored, no others
    # Positive: a query at a VALID point is found at distance ~0.
    tgt, d2, found = nearest_neighbors(grid, jnp.asarray(pts[0][None]))
    assert bool(found[0]) and float(d2[0]) < 1e-10
    np.testing.assert_allclose(np.asarray(tgt[0]), pts[0], atol=1e-6)
    # Query near a masked-out point far from all valid points: not found
    q = pts[99] + 100.0
    _, _, found = nearest_neighbors(grid, jnp.asarray(q[None]))
    assert not bool(found[0])


def test_feats_sorted_alongside(rng):
    pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    feats = pts.sum(axis=1, keepdims=True).astype(np.float32)  # feature == f(point)
    grid = build_hash_grid(jnp.asarray(pts), 1.0, feats=jnp.asarray(feats))
    stored_pts, stored_feats, valid = export_pointcloud(grid)
    v = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(stored_feats)[v][:, 0], np.asarray(stored_pts)[v].sum(axis=1), atol=1e-5
    )


@pytest.mark.slow
def test_slab_and_aos_candidate_views_agree(rng):
    """The SoA slab path (hot ICP path) and the AoS convenience view select the
    same nearest neighbors, and row_global maps back to the exact stored rows."""
    from vfmreg_tpu.ops.hash_grid import (
        gather_candidate_slabs,
        gather_candidates,
        nn_from_candidates,
        nn_from_slabs,
    )

    pts = jnp.asarray(rng.uniform(-10, 10, (700, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-10, 10, (100, 3)).astype(np.float32))
    grid = build_hash_grid(pts, 1.0)

    cands = gather_candidate_slabs(grid, q)
    pt_s, d_s, f_s = nn_from_slabs(cands, grid.points, q)
    cand, ok = gather_candidates(grid, q)
    pt_a, d_a, f_a = nn_from_candidates(cand, ok, q)

    np.testing.assert_array_equal(np.asarray(f_s), np.asarray(f_a))
    np.testing.assert_allclose(
        np.asarray(d_s)[np.asarray(f_s)], np.asarray(d_a)[np.asarray(f_a)], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pt_s)[np.asarray(f_s)], np.asarray(pt_a)[np.asarray(f_a)], atol=1e-6
    )

    # row_global round-trip: every valid candidate equals the stored point row.
    xs, ys, zs = (np.asarray(a) for a in cands.coords())
    n = xs.shape[0]
    cand_soa = np.stack([xs, ys, zs], axis=-1).reshape(n, -1, 3)
    rowg = np.asarray(cands.row_global())
    okm = np.asarray(cands.ok())
    stored = np.asarray(grid.points)
    sel = np.where(okm)
    np.testing.assert_allclose(cand_soa[sel], stored[rowg[sel]], atol=0)


@pytest.mark.slow
def test_nn_kernel_matches_fallback(rng):
    """Pallas nn_argmin (interpret mode) == the jnp cached-NN fallback, and the
    cached-NN path agrees with the exact slab NN through the public API."""
    from vfmreg_tpu.ops.hash_grid import (
        build_nn_cache,
        gather_candidate_slabs,
        nn_from_cache,
        nn_from_slabs,
    )
    from vfmreg_tpu.ops.nn_kernel import nn_argmin

    pts = jnp.asarray(rng.uniform(-10, 10, (900, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-10, 10, (130, 3)).astype(np.float32))
    grid = build_hash_grid(pts, 1.0)
    cands = gather_candidate_slabs(grid, q)
    cache = build_nn_cache(cands, q)

    d2_k, k_k = nn_argmin(cache.cx, cache.cy, cache.cz, q, block_q=64, interpret=True)

    with np.errstate(over="ignore"):  # sentinel coords overflow to +inf by design
        d2 = (
            (np.asarray(cache.cx) - np.asarray(q)[None, :, 0]) ** 2
            + (np.asarray(cache.cy) - np.asarray(q)[None, :, 1]) ** 2
            + (np.asarray(cache.cz) - np.asarray(q)[None, :, 2]) ** 2
        )
    best = d2.min(axis=0)
    ks = np.where(d2 == best[None, :], np.arange(d2.shape[0])[:, None], 2**30).min(axis=0)
    fin = np.isfinite(best)
    np.testing.assert_allclose(np.asarray(d2_k)[fin], best[fin], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(k_k)[fin], ks[fin])

    pt_c, d_c, f_c = nn_from_cache(cache, grid.points, q)
    pt_s, d_s, f_s = nn_from_slabs(cands, grid.points, q)
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_s))
    fm = np.asarray(f_c)
    np.testing.assert_allclose(np.asarray(d_c)[fm], np.asarray(d_s)[fm], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pt_c)[fm], np.asarray(pt_s)[fm], atol=1e-6)


@pytest.mark.slow
def test_gn_kernel_matches_build_linear_system(rng):
    """Fused GN-moments kernel (interpret mode) == nn_from_cache +
    build_linear_system on the same champion cache."""
    from vfmreg_tpu.ops.gn_kernel import assemble_gn_system, gn_moments_from_cache
    from vfmreg_tpu.ops.hash_grid import (
        build_nn_cache,
        gather_candidate_slabs,
        nn_from_cache,
    )
    from vfmreg_tpu.registration.icp import build_linear_system

    pts = jnp.asarray(rng.uniform(-10, 10, (900, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-10, 10, (130, 3)).astype(np.float32))
    qmask = jnp.asarray(rng.rand(130) > 0.1)
    grid = build_hash_grid(pts, 1.0)
    cache = build_nn_cache(gather_candidate_slabs(grid, q, qmask), q, qmask)

    center = jnp.asarray(np.mean(np.asarray(q), axis=0))
    kernel, max_dist = jnp.float32(0.667), jnp.float32(1.5)

    nbr, dist, found = nn_from_cache(cache, grid.points, q, qmask, use_pallas=False)
    accept = found & (dist < max_dist)
    JTJ_ref, JTr_ref, n_ref = build_linear_system(q, nbr, accept, kernel, center)

    m = gn_moments_from_cache(
        cache.cx, cache.cy, cache.cz, q, center, kernel, max_dist,
        block_q=64, interpret=True,
    )
    JTJ, JTr, n = assemble_gn_system(m)
    assert int(n) == int(n_ref)
    np.testing.assert_allclose(np.asarray(JTJ), np.asarray(JTJ_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(JTr), np.asarray(JTr_ref), rtol=2e-4, atol=2e-4)


def test_champions_from_planes_matches_build_nn_cache():
    """The single-pass Pallas champion rebuild (`ops/champion_kernel`,
    interpret mode here) selects bit-identical champions to
    `build_nn_cache`: same d2, same lowest-index tie-break, same sentinel /
    mask gating — including empty neighborhoods and masked queries."""
    import jax
    import jax.numpy as jnp

    from vfmreg_tpu.ops.champion_kernel import champions_from_planes
    from vfmreg_tpu.ops.hash_grid import (
        build_hash_grid,
        build_nn_cache,
        gather_candidate_slabs,
    )

    rng = np.random.RandomState(0)
    m, n = 4096, 512
    pts = rng.uniform(-20, 20, (m, 3)).astype(np.float32)
    # Duplicate coordinates to exercise the tie-break.
    pts[100:140] = pts[60:100]
    grid = build_hash_grid(jnp.asarray(pts), 1.0, mask=jnp.ones((m,), bool))
    q = np.concatenate([
        pts[rng.choice(m, n - 64)] + rng.normal(0, 0.3, (n - 64, 3)).astype(np.float32),
        rng.uniform(200, 300, (64, 3)).astype(np.float32),  # empty neighborhoods
    ]).astype(np.float32)
    qm = np.ones((n,), bool)
    qm[-8:] = False  # masked queries
    qj, qmj = jnp.asarray(q), jnp.asarray(qm)

    cands = gather_candidate_slabs(grid, qj, qmj)
    ref = build_nn_cache(cands, qj, qmj)
    group = -(-grid.max_points_per_voxel // 8) * 8
    cxt, cyt, czt = cands.planes(group)
    cx, cy, cz = champions_from_planes(
        cxt, cyt, czt, qj, qmj, group=group, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(cx), np.asarray(ref.cx))
    np.testing.assert_array_equal(np.asarray(cy), np.asarray(ref.cy))
    np.testing.assert_array_equal(np.asarray(cz), np.asarray(ref.cz))
