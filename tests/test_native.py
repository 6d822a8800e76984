"""Native C++ voxel hash: parity with the numpy/device path."""

import numpy as np
import pytest

from vfmreg_tpu.native import native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib not built")


def test_native_cap_semantics(rng):
    from vfmreg_tpu.native import NativeVoxelHashMap

    m = NativeVoxelHashMap(1.0, 100.0, 5)
    pts = (0.5 + 0.4 * rng.uniform(-1, 1, (50, 3))).astype(np.float32)
    m.add_points(pts)
    assert len(m) == 5
    got, _ = m.export()
    np.testing.assert_allclose(got, pts[:5], atol=1e-6)


def test_native_correspondences_match_device(rng):
    from vfmreg_tpu.kiss.mapping import VoxelHashMap

    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    queries = (pts[:50] + 0.05).astype(np.float32)

    m_native = VoxelHashMap(1.0, 100.0, 20, use_native=True)
    m_native.add_points(pts)
    m_numpy = VoxelHashMap(1.0, 100.0, 20, use_native=False)
    m_numpy.add_points(pts)

    s1, t1 = m_native.get_correspondences(queries, 0.5)
    s2, t2 = m_numpy.get_correspondences(queries, 0.5)
    assert s1.shape == s2.shape
    # Same correspondence sets (order-insensitive)
    set1 = {tuple(np.round(np.r_[a, b], 4)) for a, b in zip(s1, t1)}
    set2 = {tuple(np.round(np.r_[a, b], 4)) for a, b in zip(s2, t2)}
    assert set1 == set2

    # Host-side native search agrees too
    sn, tn = m_native._native.get_correspondences(queries, 0.5)
    setn = {tuple(np.round(np.r_[a, b], 4)) for a, b in zip(sn, tn)}
    assert setn == set2


def test_native_update_and_eviction(rng):
    from vfmreg_tpu.kiss.mapping import VoxelHashMap

    for use_native in (True, False):
        m = VoxelHashMap(1.0, 10.0, 20, use_native=use_native)
        near = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
        m.add_points(near)
        pose = np.eye(4)
        pose[:3, 3] = [30.0, 0, 0]
        m.update(rng.uniform(-5, 5, (200, 3)).astype(np.float32), pose)
        pc = m.point_cloud()
        # After updating at x=30 with max_distance=10, the origin cluster is gone
        assert np.all(np.linalg.norm(pc - pose[:3, 3], axis=1) < 16.0)


def test_native_descriptor_roundtrip(rng):
    from vfmreg_tpu.kiss.mapping import VoxelHashMap

    pts = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    feats = rng.normal(size=(300, 16)).astype(np.float32)
    m = VoxelHashMap(1.0, 100.0, 20, use_native=True)
    m.add_points(np.c_[pts, feats])
    pcn = m.point_cloud_n()
    assert pcn.shape[1] == 19
    src, tgt = m.get_vfm_correspondences(np.c_[pts[:40] + 0.01, feats[:40]], 0.8)
    assert src.shape[0] == 40
