import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.models.pointdsc import PointDSCModel, init_pointdsc_params, pointdsc_forward


def make_corrs(rng, n=400, outlier_frac=0.6, noise=0.03):
    T = np.eye(4)
    T[:3, :3] = R.from_euler("xyz", rng.uniform(-40, 40, 3), degrees=True).as_matrix()
    T[:3, 3] = rng.uniform(-5, 5, 3)
    src = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    tgt = (src @ T[:3, :3].T + T[:3, 3] + rng.normal(0, noise, (n, 3))).astype(np.float32)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    tgt[out_idx] = rng.uniform(-15, 15, (n_out, 3))
    return src, tgt, T


@pytest.mark.slow
def test_pointdsc_shapes(rng):
    params = init_pointdsc_params(jax.random.PRNGKey(0), num_layers=2)
    src, tgt, T = make_corrs(rng, n=128, outlier_frac=0.3)
    corr = np.c_[src, tgt] - np.c_[src, tgt].mean(0)
    out = pointdsc_forward(
        params,
        jnp.asarray(corr),
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.ones(128, dtype=bool),
    )
    assert out["final_trans"].shape == (4, 4)
    assert np.all(np.isfinite(np.asarray(out["final_trans"])))


@pytest.mark.slow
def test_pointdsc_spatial_consistency_recovers_pose(rng):
    """Even with random network weights, the spatial-consistency power iteration
    + inlier-count selection + post-refinement recover the pose at ~40% outliers (the learned
    part mainly sharpens seeds/features)."""
    model = PointDSCModel(seed=0)
    # Random weights need hypotheses within the 0.1 m refinement basin, so
    # lower noise than the trained model handles (see module docstring).
    src, tgt, T = make_corrs(rng, n=512, outlier_frac=0.4, noise=0.005)
    got = model.register(src, tgt)
    te = np.linalg.norm(got[:3, 3] - T[:3, 3])
    cos = np.clip((np.trace(got[:3, :3].T @ T[:3, :3]) - 1) / 2, -1, 1)
    re = np.rad2deg(np.arccos(cos))
    assert te < 0.1 and re < 1.0, (te, re)


@pytest.mark.slow
def test_pointdsc_subsamples_large_input(rng):
    model = PointDSCModel(seed=0, max_corr=256)
    src, tgt, T = make_corrs(rng, n=1000, outlier_frac=0.2, noise=0.02)
    got = model.register(src, tgt)
    te = np.linalg.norm(got[:3, 3] - T[:3, 3])
    assert te < 0.3


@pytest.mark.slow
def test_pointdsc_padding_is_inert(rng):
    """Bucket padding must not change real rows: pad columns previously
    entered the NonLocal softmax with attention*logits = 0 (weight exp(0)=1),
    mixing pad V-projections into every message."""
    params = init_pointdsc_params(jax.random.PRNGKey(0), num_layers=2)
    src, tgt, T = make_corrs(rng, n=100, outlier_frac=0.2)
    corr = np.c_[src, tgt] - np.c_[src, tgt].mean(0)

    def run(n_pad):
        c = np.zeros((100 + n_pad, corr.shape[1]), np.float32)
        s = np.zeros((100 + n_pad, 3), np.float32)
        t = np.zeros((100 + n_pad, 3), np.float32)
        c[:100], s[:100], t[:100] = corr, src, tgt
        m = np.zeros(100 + n_pad, bool)
        m[:100] = True
        return pointdsc_forward(
            params, jnp.asarray(c), jnp.asarray(s), jnp.asarray(t), jnp.asarray(m)
        )

    a = run(0)
    b = run(28)
    np.testing.assert_allclose(
        np.asarray(a["final_trans"]), np.asarray(b["final_trans"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["confidence"])[:100], np.asarray(b["confidence"])[:100], atol=1e-5
    )
