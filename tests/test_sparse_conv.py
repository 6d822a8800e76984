import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vfmreg_tpu.ops.sparse_conv import (
    build_coord_lookup,
    downsample_coords,
    kernel_offsets,
    lookup_rows,
    sparse_conv_apply,
)
from vfmreg_tpu.models.sparse_resunet import (
    FCGF_CONFIG,
    GCL_CONFIG,
    init_resunet_params,
    resunet_forward,
)


def test_coord_lookup_roundtrip(rng):
    coords = jnp.asarray(rng.randint(-50, 50, (200, 3)), dtype=jnp.int32)
    mask = jnp.ones(200, dtype=bool)
    lk = build_coord_lookup(coords, mask)
    row, found = lookup_rows(lk, coords, mask)
    assert bool(found.all())
    np.testing.assert_array_equal(np.asarray(coords)[np.asarray(row)], np.asarray(coords))
    # Absent coords are not found
    far = coords + 1000
    _, found2 = lookup_rows(lk, far, mask)
    assert not bool(found2.any())


def test_sparse_conv_identity_kernel(rng):
    """A kernel with identity at the center offset and zeros elsewhere is a no-op."""
    coords = jnp.asarray(rng.randint(-20, 20, (100, 3)), dtype=jnp.int32)
    coords = jnp.unique(coords, axis=0, size=100, fill_value=999)
    mask = jnp.asarray(np.asarray(coords)[:, 0] != 999)
    feats = jnp.asarray(rng.normal(size=(100, 8)).astype(np.float32))
    lk = build_coord_lookup(coords, mask)
    offs = jnp.asarray(kernel_offsets(3, 1))
    W = jnp.zeros((27, 8, 8))
    W = W.at[13].set(jnp.eye(8))  # center offset (0,0,0) at index 13
    out = sparse_conv_apply(feats, coords, lk, mask, coords, mask, W, offs)
    np.testing.assert_allclose(np.asarray(out)[np.asarray(mask)], np.asarray(feats)[np.asarray(mask)], atol=1e-6)


def test_sparse_conv_neighbor_sum(rng):
    """All-ones 3^3 kernel on a dense 4x4x4 grid counts 27-neighborhoods."""
    g = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"), -1).reshape(-1, 3)
    coords = jnp.asarray(g, dtype=jnp.int32)
    mask = jnp.ones(64, dtype=bool)
    feats = jnp.ones((64, 1), dtype=jnp.float32)
    lk = build_coord_lookup(coords, mask)
    offs = jnp.asarray(kernel_offsets(3, 1))
    W = jnp.ones((27, 1, 1))
    out = np.asarray(sparse_conv_apply(feats, coords, lk, mask, coords, mask, W, offs))[:, 0]
    # interior voxel (1,1,1) has 27 neighbors; corner (0,0,0) has 8
    interior = np.flatnonzero((g == 1).all(1))[0]
    corner = np.flatnonzero((g == 0).all(1))[0]
    assert out[interior] == 27.0
    assert out[corner] == 8.0


def test_downsample_coords():
    coords = jnp.asarray([[0, 0, 0], [1, 1, 1], [2, 0, 0], [3, 1, 0], [5, 5, 5]], dtype=jnp.int32)
    mask = jnp.ones(5, dtype=bool)
    out, m = downsample_coords(coords, mask, 1)
    got = {tuple(c) for c in np.asarray(out)[np.asarray(m)]}
    assert got == {(0, 0, 0), (2, 0, 0), (4, 4, 4)}


@pytest.mark.slow
def test_resunet_forward_shapes(rng):
    for cfg in (FCGF_CONFIG, GCL_CONFIG):
        params = init_resunet_params(jax.random.PRNGKey(0), cfg)
        coords = jnp.asarray(rng.randint(-30, 30, (256, 3)), dtype=jnp.int32)
        mask = jnp.ones(256, dtype=bool)
        feats = jnp.ones((256, 1), dtype=jnp.float32)
        out = np.asarray(resunet_forward(params, coords, feats, mask, cfg))
        assert out.shape == (256, 32)
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)


def test_resunet_translation_invariance(rng):
    """Sparse convs depend only on relative coordinates: translating the grid
    by a multiple of the full stride pyramid (8) leaves features unchanged."""
    cfg = FCGF_CONFIG
    params = init_resunet_params(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray(rng.randint(0, 20, (128, 3)), dtype=jnp.int32)
    mask = jnp.ones(128, dtype=bool)
    feats = jnp.ones((128, 1), dtype=jnp.float32)
    out0 = np.asarray(resunet_forward(params, coords, feats, mask, cfg))
    out1 = np.asarray(resunet_forward(params, coords + 8 * 5, feats, mask, cfg))
    np.testing.assert_allclose(out0, out1, atol=1e-4)


def test_fcgf_extractor(rng):
    from vfmreg_tpu.descriptors.fcgf import extract_fcgf_features

    pts = rng.uniform(-10, 10, (2000, 3)).astype(np.float32)
    down, feats = extract_fcgf_features(pts, 0.3)
    assert feats.shape == (down.shape[0], 32)
    assert down.shape[0] < 2000
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-4)


def _find_hash_collision():
    """Two DISTINCT int coords with equal 32-bit spatial hash (birthday search)."""
    from vfmreg_tpu.ops.voxel import voxel_hash

    rng = np.random.RandomState(0)
    for trial in range(20):
        coords = rng.randint(-500, 500, size=(200_000, 3)).astype(np.int32)
        h = np.asarray(voxel_hash(jnp.asarray(coords)))
        _, first_idx, counts = np.unique(h, return_index=True, return_counts=True)
        dup_hashes = _[counts > 1]
        for dh in dup_hashes[:50]:
            rows = np.nonzero(h == dh)[0]
            for a in rows:
                for b in rows:
                    if a < b and np.any(coords[a] != coords[b]):
                        return coords[a], coords[b]
    return None


def test_hash_collision_does_not_corrupt_lookup_or_downsample():
    """Distinct coordinates colliding on the 32-bit hash must (a) BOTH survive
    unique-site extraction and (b) never alias each other's feature rows in
    lookup_rows — identity is confirmed on the coordinates, hash is only the
    sort key."""
    pair = _find_hash_collision()
    assert pair is not None, "no 32-bit collision found in 4M samples (unexpected)"
    ca, cb = pair

    from vfmreg_tpu.ops.sparse_conv import build_coord_lookup, lookup_rows

    filler = np.arange(12, dtype=np.int32)[:, None] * 3 + np.array([[7, 11, 13]], np.int32)
    coords = jnp.asarray(np.vstack([filler, ca[None], cb[None]]))
    n = coords.shape[0]
    mask = jnp.ones(n, bool)

    lk = build_coord_lookup(coords, mask)
    rows, found = lookup_rows(lk, coords, mask)
    assert bool(jnp.all(found))
    # each coordinate resolves to ITS OWN row, not its collision partner's
    np.testing.assert_array_equal(np.asarray(rows), np.arange(n))

    # unique-site extraction (now hash-free lexsort) keeps both distinct
    # sites and merges true duplicates
    from vfmreg_tpu.ops.sparse_conv import downsample_coords

    c2 = jnp.asarray(np.vstack([ca[None] * 2, cb[None] * 2, ca[None] * 2]))  # duplicate of a
    m2 = jnp.ones(3, bool)
    out_c, out_m = downsample_coords(c2, m2, 1)
    kept = np.asarray(out_c)[np.asarray(out_m)]
    assert kept.shape[0] == 2, kept
    kept_set = {tuple(r) for r in kept.tolist()}
    assert kept_set == {tuple((ca * 2).tolist()), tuple((cb * 2).tolist())}
