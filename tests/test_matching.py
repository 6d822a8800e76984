import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vfmreg_tpu.ops import matching


def test_l2_normalize_zero_safe():
    x = jnp.asarray([[3.0, 4.0], [0.0, 0.0]])
    out = np.asarray(matching.l2_normalize(x))
    np.testing.assert_allclose(out[0], [0.6, 0.8], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 0.0])


def test_masked_median_odd_even():
    v = jnp.asarray([5.0, 1.0, 3.0, 100.0, 2.0])
    m = jnp.asarray([True, True, True, False, True])  # {5,1,3,2}
    assert abs(float(matching.masked_median(v, m)) - 2.5) < 1e-6
    m2 = jnp.asarray([True, True, True, False, False])  # {5,1,3}
    assert abs(float(matching.masked_median(v, m2)) - 3.0) < 1e-6


def test_masked_mad():
    v = jnp.asarray([1.0, 2.0, 3.0, 4.0, 100.0])
    m = jnp.ones(5, dtype=bool)
    med, mad = matching.masked_mad(v, m)
    assert abs(float(med) - 3.0) < 1e-6
    # |d - 3| = [2,1,0,1,97], median = 1 -> mad = 1.4826
    assert abs(float(mad) - 1.4826) < 1e-4


def test_vfm_correspondences_exact_match(rng):
    # Map with distinctive descriptors; scan = subset => 1-NN must find itself.
    d = 16
    map_pts = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    map_feats = rng.normal(size=(300, d)).astype(np.float32)
    sel = rng.choice(300, 50, replace=False)
    scan_pts = map_pts[sel] + 0.01
    scan_feats = map_feats[sel]
    corr = matching.get_vfm_correspondences(
        jnp.asarray(map_pts),
        jnp.asarray(map_feats),
        jnp.ones(300, dtype=bool),
        jnp.asarray(scan_pts),
        jnp.asarray(scan_feats),
        jnp.ones(50, dtype=bool),
        min_cosine_similarity=0.8,
        chunk=64,
    )
    assert int(corr.count) == 50
    np.testing.assert_allclose(np.asarray(corr.target), map_pts[sel], atol=1e-5)
    np.testing.assert_allclose(np.asarray(corr.similarity), 1.0, atol=1e-5)


def test_vfm_correspondences_threshold(rng):
    d = 8
    map_pts = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
    map_feats = np.eye(d)[rng.randint(0, d // 2, 100)].astype(np.float32)
    # scan descriptors orthogonal to all map descriptors -> similarity 0 -> rejected
    scan_feats = np.eye(d)[d // 2 + rng.randint(0, d // 2, 20)].astype(np.float32)
    scan_pts = rng.uniform(-10, 10, (20, 3)).astype(np.float32)
    corr = matching.get_vfm_correspondences(
        jnp.asarray(map_pts),
        jnp.asarray(map_feats),
        jnp.ones(100, dtype=bool),
        jnp.asarray(scan_pts),
        jnp.asarray(scan_feats),
        jnp.ones(20, dtype=bool),
        min_cosine_similarity=0.8,
        chunk=32,
    )
    assert int(corr.count) == 0


def test_vfm_correspondences_respects_map_mask(rng):
    d = 4
    map_pts = np.zeros((10, 3), dtype=np.float32)
    map_feats = np.ones((10, d), dtype=np.float32)
    map_mask = np.zeros(10, dtype=bool)  # entire map masked out
    scan_feats = np.ones((5, d), dtype=np.float32)
    corr = matching.get_vfm_correspondences(
        jnp.asarray(map_pts),
        jnp.asarray(map_feats),
        jnp.asarray(map_mask),
        jnp.zeros((5, 3)),
        jnp.asarray(scan_feats),
        jnp.ones(5, dtype=bool),
        chunk=8,
    )
    assert int(corr.count) == 0


def _scipy_mutual(feats0, feats1):
    from scipy.spatial import cKDTree

    nns01 = cKDTree(feats1).query(feats0, k=1)[1]
    nns10 = cKDTree(feats0).query(feats1, k=1)[1]
    keep = nns10[nns01] == np.arange(len(feats0))
    return keep, nns01


def test_mutual_nn_matches_scipy(rng):
    f0 = rng.normal(size=(120, 16)).astype(np.float32)
    f1 = rng.normal(size=(150, 16)).astype(np.float32)
    ref_keep, ref_nn = _scipy_mutual(f0, f1)
    out = matching.mutual_nn_correspondences(
        jnp.asarray(f0),
        jnp.ones(120, dtype=bool),
        jnp.asarray(f1),
        jnp.ones(150, dtype=bool),
        mutual_filter=True,
        chunk=64,
    )
    np.testing.assert_array_equal(np.asarray(out.mask), ref_keep)
    np.testing.assert_array_equal(np.asarray(out.idx1)[ref_keep], ref_nn[ref_keep])


def test_mutual_nn_topk(rng):
    f0 = rng.normal(size=(100, 8)).astype(np.float32)
    f1 = rng.normal(size=(100, 8)).astype(np.float32)
    out = matching.mutual_nn_correspondences(
        jnp.asarray(f0),
        jnp.ones(100, dtype=bool),
        jnp.asarray(f1),
        jnp.ones(100, dtype=bool),
        mutual_filter=False,
        n_points=10,
        chunk=32,
    )
    kept = np.asarray(out.mask)
    assert kept.sum() == 10
    # Kept rows are exactly the 10 smallest distances
    d = np.asarray(out.dist)
    assert set(np.flatnonzero(kept)) == set(np.argsort(d)[:10])


@pytest.mark.slow
def test_pallas_cosine_argmax_matches_scan(rng):
    """The Pallas fused kernel (interpret mode on CPU) matches the streaming path."""
    import jax.numpy as jnp

    from vfmreg_tpu.ops.cosine_kernel import cosine_argmax
    from vfmreg_tpu.ops.matching import _chunked_argmax_ip, l2_normalize

    q = l2_normalize(jnp.asarray(rng.normal(size=(100, 32)).astype(np.float32)))
    db = l2_normalize(jnp.asarray(rng.normal(size=(500, 32)).astype(np.float32)))
    mask = np.ones(500, dtype=bool)
    mask[450:] = False
    ref_sim, ref_idx = _chunked_argmax_ip(q, db, jnp.asarray(mask), 128)
    sim, idx = cosine_argmax(q, db, jnp.asarray(mask), block_q=64, block_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(sim), np.asarray(ref_sim), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_batched_vfm_correspondences_matches_vmapped():
    """`get_vfm_correspondences_batched` (flattened-query batch, map streamed
    once) returns exactly the per-scan `get_vfm_correspondences` results."""
    import jax

    from vfmreg_tpu.ops.matching import (
        get_vfm_correspondences,
        get_vfm_correspondences_batched,
    )

    rng = np.random.RandomState(3)
    b, n, m, d = 4, 64, 512, 32
    map_pts = rng.uniform(-20, 20, (m, 3)).astype(np.float32)
    map_feats = rng.randn(m, d).astype(np.float32)
    map_mask = rng.rand(m) > 0.1
    sel = rng.choice(m, (b, n))
    scan_pts = map_pts[sel] + rng.normal(0, 0.05, (b, n, 3)).astype(np.float32)
    scan_feats = map_feats[sel] + rng.normal(0, 0.01, (b, n, d)).astype(np.float32)
    scan_mask = rng.rand(b, n) > 0.2

    batched = get_vfm_correspondences_batched(
        jnp.asarray(map_pts), jnp.asarray(map_feats), jnp.asarray(map_mask),
        jnp.asarray(scan_pts), jnp.asarray(scan_feats), jnp.asarray(scan_mask),
    )
    single = jax.vmap(
        lambda sp, sf, sm: get_vfm_correspondences(
            jnp.asarray(map_pts), jnp.asarray(map_feats), jnp.asarray(map_mask),
            sp, sf, sm,
        )
    )(jnp.asarray(scan_pts), jnp.asarray(scan_feats), jnp.asarray(scan_mask))

    np.testing.assert_array_equal(np.asarray(batched.mask), np.asarray(single.mask))
    np.testing.assert_array_equal(np.asarray(batched.target), np.asarray(single.target))
    np.testing.assert_allclose(
        np.asarray(batched.similarity), np.asarray(single.similarity), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(batched.median_distance), np.asarray(single.median_distance), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(batched.mean_similarity), np.asarray(single.mean_similarity), atol=1e-6
    )
