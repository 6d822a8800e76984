import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vfmreg_tpu.descriptors.fpfh import estimate_normals, extract_fpfh_features


def make_structured_cloud(rng, n=1200):
    """Box corner: three orthogonal faces with curvature variation."""
    m = n // 3
    floor = np.c_[rng.uniform(0, 4, (m, 2)), np.zeros((m, 1))]
    wall_a = np.c_[rng.uniform(0, 4, (m, 1)), np.zeros((m, 1)), rng.uniform(0, 4, (m, 1))]
    sphere = rng.normal(size=(m, 3))
    sphere = sphere / np.linalg.norm(sphere, axis=1, keepdims=True) + [2, 2, 1]
    pts = np.concatenate([floor, wall_a, sphere]).astype(np.float32)
    return pts + rng.normal(0, 0.005, pts.shape).astype(np.float32)


def test_estimate_normals_planar(rng):
    pts = np.c_[rng.uniform(0, 4, (500, 2)), np.zeros((500, 1))].astype(np.float32)
    pts += rng.normal(0, 0.002, pts.shape).astype(np.float32)
    normals = np.asarray(
        estimate_normals(jnp.asarray(pts), jnp.ones(500, dtype=bool), radius=0.5)
    )
    # Floor normals ~ +z
    assert np.mean(np.abs(normals[:, 2])) > 0.99


def test_fpfh_shapes_and_scale(rng):
    pts = make_structured_cloud(rng)
    out_pts, feats = extract_fpfh_features(pts, 0.1)
    assert feats.shape == (out_pts.shape[0], 33)
    assert np.all(np.isfinite(feats))
    # Histogram blocks roughly sum to ~200 (100 SPFH + 100 weighted-neighbor)
    block = feats.reshape(-1, 3, 11).sum(axis=2)
    assert 100.0 <= np.median(block) <= 220.0


def test_fpfh_rotation_invariance(rng):
    pts = make_structured_cloud(rng)
    Rm = R.from_euler("xyz", [20, -35, 50], degrees=True).as_matrix().astype(np.float32)
    pts_rot = pts @ Rm.T
    p0, f0 = extract_fpfh_features(pts, 0.1)
    p1, f1 = extract_fpfh_features(pts_rot, 0.1)
    # Match rotated points back to originals and compare descriptors.
    from scipy.spatial import cKDTree

    idx = cKDTree(p1 @ np.linalg.inv(Rm.astype(np.float64)).T).query(p0, k=1)[1]
    cos = np.sum(f0 * f1[idx], axis=1) / (
        np.linalg.norm(f0, axis=1) * np.linalg.norm(f1[idx], axis=1) + 1e-9
    )
    # FPFH is rotation invariant up to neighborhood re-sampling and the
    # unoriented-normal sign ambiguity (same as PCL/Open3D in the reference).
    assert np.median(cos) > 0.9


def test_fpfh_distinguishes_geometry(rng):
    pts = make_structured_cloud(rng)
    out_pts, feats = extract_fpfh_features(pts, 0.1, normalize=True)
    # Flat-floor points vs sphere points should have clearly different descriptors.
    floor_idx = np.flatnonzero((np.abs(out_pts[:, 2]) < 0.05) & (out_pts[:, 1] > 0.5))
    sphere_idx = np.flatnonzero(np.linalg.norm(out_pts - [2, 2, 1], axis=1) < 1.2)
    if len(floor_idx) > 10 and len(sphere_idx) > 10:
        f_floor = feats[floor_idx].mean(0)
        f_sphere = feats[sphere_idx].mean(0)
        cos = f_floor @ f_sphere / (np.linalg.norm(f_floor) * np.linalg.norm(f_sphere))
        assert cos < 0.95


def test_fpfh_registration_end_to_end(rng):
    """FPFH + mutual NN + RANSAC recovers a transform on the synthetic corner."""
    import jax
    from vfmreg_tpu.ops.matching import mutual_nn_correspondences
    from vfmreg_tpu.registration.ransac import ransac_registration

    pts = make_structured_cloud(rng, n=1500)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.from_euler("z", 30, degrees=True).as_matrix()
    T[:3, 3] = [1.0, -2.0, 0.3]
    scan = (pts - T[:3, 3]) @ T[:3, :3]

    p_map, f_map = extract_fpfh_features(pts, 0.1)
    p_scan, f_scan = extract_fpfh_features(scan, 0.1)

    def pad(x, n):
        out = np.zeros((n, x.shape[1]), dtype=np.float32)
        out[: x.shape[0]] = x
        m = np.zeros(n, dtype=bool)
        m[: x.shape[0]] = True
        return jnp.asarray(out), jnp.asarray(m)

    n = 2048
    fs, ms = pad(f_scan, n)
    fm, mm = pad(f_map, n)
    mnn = mutual_nn_correspondences(fs, ms, fm, mm, mutual_filter=True, chunk=512)
    ps, _ = pad(p_scan, n)
    pm, _ = pad(p_map, n)
    src = ps[mnn.idx0]
    tgt = pm[mnn.idx1]
    res = ransac_registration(src, tgt, mnn.mask, jax.random.PRNGKey(0), num_hypotheses=2000, chunk=256)
    got = np.asarray(res.pose)
    # Coarse alignment: good enough for the ICP refinement stage to take over.
    assert np.linalg.norm(got[:3, 3] - T[:3, 3]) < 0.7
