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
