import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

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
    # The selected clique should be mostly true inliers.
    clique = np.asarray(res.inlier_mask)
    if clique.sum() > 0:
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
