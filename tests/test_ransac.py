import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.registration.ransac import ransac_registration, snap_correspondences


def make_corrs(rng, n=200, outlier_frac=0.6, far=False):
    T = np.eye(4)
    T[:3, :3] = R.from_euler("xyz", rng.uniform(-30, 30, 3), degrees=True).as_matrix()
    T[:3, 3] = rng.uniform(-20, 20, 3)
    src = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    if far:
        src += np.array([400.0, -350.0, 0.0], dtype=np.float32)
    tgt = (src @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    n_out = int(n * outlier_frac)
    tgt[:n_out] = rng.uniform(-40, 40, (n_out, 3)) + src[:n_out].mean(0)
    return src, tgt, T


def test_ransac_recovers_pose_under_outliers(rng):
    # Open3D's criteria in the reference (max_corr_dist=10000 -> all-inlier,
    # min-RMSE ranking; `registration_node.py:319-327`) tolerates a moderate
    # outlier fraction — it is an LS-consensus, not an inlier-count consensus.
    src, tgt, T = make_corrs(rng, outlier_frac=0.3)
    res = ransac_registration(
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.ones(src.shape[0], dtype=bool),
        jax.random.PRNGKey(0),
        num_hypotheses=4000,
        chunk=256,
    )
    # The invariant of the o3d-0.18 objective: the selected model's full-set RMSE
    # is at least as good as the true pose's (the optimizer found its optimum).
    rmse_true = np.sqrt(np.mean(np.sum((src @ T[:3, :3].T + T[:3, 3] - tgt) ** 2, axis=1)))
    assert float(res.rmse) <= rmse_true + 1e-3
    # And the inliers are still brought into rough alignment.
    got = np.asarray(res.pose)
    moved = src @ got[:3, :3].T + got[:3, 3]
    inlier_err = np.linalg.norm(moved[60:] - tgt[60:], axis=1)
    assert np.median(inlier_err) < 5.0


def test_ransac_clean_correspondences_exact(rng):
    src, tgt, T = make_corrs(rng, outlier_frac=0.0)
    res = ransac_registration(
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.ones(src.shape[0], dtype=bool),
        jax.random.PRNGKey(1),
        num_hypotheses=512,
        chunk=128,
    )
    got = np.asarray(res.pose)
    np.testing.assert_allclose(got, T, atol=1e-3)
    assert float(res.rmse) < 1e-2


def test_ransac_far_from_origin(rng):
    src, tgt, T = make_corrs(rng, outlier_frac=0.0, far=True)
    res = ransac_registration(
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.ones(src.shape[0], dtype=bool),
        jax.random.PRNGKey(2),
        num_hypotheses=512,
        chunk=128,
    )
    got = np.asarray(res.pose)
    moved = src @ got[:3, :3].T + got[:3, 3]
    assert np.max(np.linalg.norm(moved - tgt, axis=1)) < 0.05


def test_ransac_respects_mask(rng):
    src, tgt, T = make_corrs(rng, outlier_frac=0.0)
    # Corrupt the masked-out rows grossly; result must be unaffected.
    tgt2 = tgt.copy()
    tgt2[:50] += 1000.0
    mask = np.ones(src.shape[0], dtype=bool)
    mask[:50] = False
    res = ransac_registration(
        jnp.asarray(src),
        jnp.asarray(tgt2),
        jnp.asarray(mask),
        jax.random.PRNGKey(3),
        num_hypotheses=512,
        chunk=128,
    )
    got = np.asarray(res.pose)
    np.testing.assert_allclose(got, T, atol=1e-3)


def test_snap_correspondences(rng):
    scan = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    mappts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    # correspondences: first 10 are exact members, next 10 are 0.5m off
    src = np.concatenate([scan[:10], scan[10:20] + 0.5]).astype(np.float32)
    tgt = np.concatenate([mappts[:10], mappts[10:20]]).astype(np.float32)
    mask = np.ones(20, dtype=bool)
    s_src, s_tgt, ok = snap_correspondences(
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.asarray(mask),
        jnp.asarray(scan),
        jnp.ones(100, dtype=bool),
        jnp.asarray(mappts),
        jnp.ones(100, dtype=bool),
    )
    ok = np.asarray(ok)
    assert ok[:10].all()
    assert not ok[10:].any()
    np.testing.assert_allclose(np.asarray(s_src)[:10], scan[:10], atol=1e-6)


def test_jacobi_eigh4_matches_numpy(rng):
    """The component-form cyclic Jacobi (`procrustes._jacobi_eigh4`, the RANSAC
    hot loop) recovers eigenpairs of random symmetric 4x4 batches to f32
    machine precision."""
    from vfmreg_tpu.registration.procrustes import _jacobi_eigh4

    M = rng.randn(256, 4, 4).astype(np.float32)
    S = (M + M.transpose(0, 2, 1)) / 2
    vals, vecs = _jacobi_eigh4(jnp.asarray(S))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    np.testing.assert_allclose(
        np.sort(vals, axis=-1), np.linalg.eigvalsh(S), atol=5e-5
    )
    # Eigenvector residual: S v = lambda v, columns of vecs.
    res = np.einsum("bij,bjk->bik", S, vecs) - vals[:, None, :] * vecs
    assert np.abs(res).max() < 5e-5


def test_kabsch_horn_matches_svd_kabsch(rng):
    """Horn/Jacobi rotation core agrees with the SVD Kabsch route, including
    on degenerate (collinear) triplets, and always returns proper rotations."""
    from vfmreg_tpu.registration.procrustes import kabsch, kabsch_horn

    src = rng.randn(128, 3, 3).astype(np.float32)
    tgt = rng.randn(128, 3, 3).astype(np.float32)
    # Make a few triplets exactly collinear (rank-deficient cross-covariance).
    src[:8, 2] = 2.0 * src[:8, 1] - src[:8, 0]
    T_h = np.asarray(kabsch_horn(jnp.asarray(src), jnp.asarray(tgt)))
    R_h = T_h[:, :3, :3]
    np.testing.assert_allclose(
        R_h @ R_h.transpose(0, 2, 1), np.tile(np.eye(3), (128, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R_h), 1.0, atol=1e-5)
    # Same optimum as the SVD route: compare attained residuals (the rotations
    # themselves may differ when the optimum is non-unique).
    T_s = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(tgt)))

    def cost(T):
        moved = np.einsum("bij,bnj->bni", T[:, :3, :3], src) + T[:, None, :3, 3]
        return np.sum((moved - tgt) ** 2, axis=(1, 2))

    np.testing.assert_allclose(cost(T_h), cost(T_s), rtol=1e-4, atol=1e-4)


def test_snap_correspondences_world_scale(rng):
    """The snap filter must keep exact-member correspondences at world-scale
    coordinates: the naive -2ab argmin expansion loses ~0.1 m of precision at
    |p| ~ 100 m (and picks wrong neighbors beyond ~500 m), blowing the 1e-3
    gate. The implementation centers the NN search and gates on the directly
    computed distance."""
    from vfmreg_tpu.registration.ransac import snap_correspondences

    for offset in (100.0, 500.0, 1000.0):
        scan = (rng.rand(400, 3) * 40 + offset).astype(np.float32)
        map_pts = (rng.rand(2000, 3) * 40 + offset).astype(np.float32)
        # correspondences ARE members of the clouds (true distance 0)
        si = rng.choice(400, 200, replace=False)
        ti = rng.choice(2000, 200, replace=False)
        src, tgt = scan[si], map_pts[ti]
        s, t, ok = snap_correspondences(
            jnp.asarray(src), jnp.asarray(tgt), jnp.ones(200, bool),
            jnp.asarray(scan), jnp.ones(400, bool),
            jnp.asarray(map_pts), jnp.ones(2000, bool),
        )
        assert np.asarray(ok).all(), f"dropped {200 - int(np.asarray(ok).sum())} at offset {offset}"
        np.testing.assert_array_equal(np.asarray(s), src)
        np.testing.assert_array_equal(np.asarray(t), tgt)


def test_ransac_empty_mask_reports_failure(rng):
    """Zero valid correspondences -> rmse inf, n_corr 0, identity pose — not a
    'perfect' 0-rmse garbage model."""
    src = rng.randn(64, 3).astype(np.float32)
    tgt = rng.randn(64, 3).astype(np.float32)
    res = ransac_registration(
        jnp.asarray(src), jnp.asarray(tgt), jnp.zeros(64, bool),
        jax.random.PRNGKey(0), num_hypotheses=256, chunk=128,
    )
    assert int(res.n_corr) == 0
    assert np.isinf(float(res.rmse))
    np.testing.assert_array_equal(np.asarray(res.pose), np.eye(4, dtype=np.float32))


def test_ransac_statistic_scores_match_residual_sweep(rng):
    """The sufficient-statistics RMSE (one O(N) pass + O(1) per hypothesis,
    `ransac_registration`'s score expansion) agrees with the explicit f64
    residual sweep for arbitrary rigid models, within the documented f32
    noise bound (~1e-4 m^2 on the per-point MSE at this scale)."""
    src, tgt, _ = make_corrs(rng, n=512, outlier_frac=0.5)
    mask = np.ones(512, bool)
    mask[490:] = False

    # The statistics exactly as the kernel computes them (f32, centered).
    m = mask.astype(np.float32)
    denom = m.sum()
    c = (src * m[:, None]).sum(0) / denom
    s_c = (src - c).astype(np.float32)
    g_c = (tgt - c).astype(np.float32)
    a_vec = (s_c * m[:, None]).sum(0)
    g_vec = (g_c * m[:, None]).sum(0)
    s_ss = ((s_c * s_c).sum(-1) * m).sum()
    s_tt = ((g_c * g_c).sum(-1) * m).sum()
    A_cov = (g_c * m[:, None]).T @ s_c

    rng2 = np.random.RandomState(11)
    for _ in range(25):
        Rm = R.from_euler("xyz", rng2.uniform(-40, 40, 3), degrees=True).as_matrix()
        t = rng2.uniform(-10, 10, 3)
        stat = (
            s_ss + s_tt + denom * (t @ t)
            + 2.0 * t @ (Rm @ a_vec)
            - 2.0 * (Rm * A_cov).sum()
            - 2.0 * t @ g_vec
        ) / denom
        moved = s_c.astype(np.float64) @ Rm.T + t
        sweep = (((moved - g_c) ** 2).sum(-1) * m).sum() / denom
        assert abs(stat - sweep) < 1e-3 + 1e-6 * sweep, (stat, sweep)


def test_ransac_scoring_scales_with_hypotheses_not_corrs(rng):
    """Behavioral pin of the O(N + K) scoring at a 4x-wider correspondence
    set: clean correspondences still recover the planted pose near-exactly
    (the all-inlier min-RMSE criterion is an LS consensus — under heavy
    outliers it returns a compromise model by design, so exact-recovery is
    only a valid pin on the clean set; cf.
    test_ransac_recovers_pose_under_outliers's loose gates)."""
    src, tgt, T = make_corrs(rng, n=2048, outlier_frac=0.0)
    res = ransac_registration(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(2048, bool),
        jax.random.PRNGKey(5), num_hypotheses=8192,
    )
    got = np.asarray(res.pose)
    np.testing.assert_allclose(got, T, atol=2e-3)
    assert float(res.rmse) < 0.05
