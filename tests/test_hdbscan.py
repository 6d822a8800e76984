"""Native HDBSCAN vs sklearn's implementation (partition parity)."""

import numpy as np
import pytest

from vfmreg_tpu.utils.hdbscan import hdbscan_labels


def _ari(a, b):
    """Adjusted Rand index (tiny local implementation)."""
    from scipy.special import comb

    classes, a_idx = np.unique(a, return_inverse=True)
    clusters, b_idx = np.unique(b, return_inverse=True)
    table = np.zeros((len(classes), len(clusters)), dtype=np.int64)
    np.add.at(table, (a_idx, b_idx), 1)
    sum_comb_c = comb(table.sum(axis=1), 2).sum()
    sum_comb_k = comb(table.sum(axis=0), 2).sum()
    sum_comb = comb(table, 2).sum()
    n = comb(len(a), 2)
    expected = sum_comb_c * sum_comb_k / n
    max_index = 0.5 * (sum_comb_c + sum_comb_k)
    return (sum_comb - expected) / (max_index - expected)


@pytest.mark.parametrize("mcs,ms", [(25, 10), (50, 25)])
def test_hdbscan_matches_sklearn_on_blobs(rng, mcs, ms):
    from sklearn.cluster import HDBSCAN

    centers = np.array([[0, 0, 0], [12, 0, 0], [0, 14, 0], [8, 8, 6]], float)
    pts = np.concatenate(
        [c + rng.normal(0, 1.0, (150, 3)) for c in centers]
        + [rng.uniform(-20, 25, (60, 3))]  # background noise
    ).astype(np.float64)

    got = hdbscan_labels(pts, min_cluster_size=mcs, min_samples=ms)
    want = HDBSCAN(min_cluster_size=mcs, min_samples=ms).fit_predict(pts)

    # Same cluster COUNT and near-identical partition (label ids arbitrary).
    assert len(set(got[got >= 0])) == len(set(want[want >= 0]))
    assert _ari(got, want) > 0.95, _ari(got, want)
    # Noise sets mostly agree.
    agree = np.mean((got == -1) == (want == -1))
    assert agree > 0.95, agree


def test_hdbscan_degenerate_inputs():
    assert np.all(hdbscan_labels(np.zeros((3, 3)), 100, 25) == -1)


def test_hdbscan_single_blob_is_all_noise():
    """One dense unimodal blob: the condensed tree has no valid split, and
    hdbscan/sklearn (allow_single_cluster=False) never select the root — the
    result is all noise, not one all-points cluster."""
    from sklearn.cluster import HDBSCAN

    one_blob = np.random.RandomState(0).normal(0, 0.5, (200, 3))
    got = hdbscan_labels(one_blob, min_cluster_size=50, min_samples=10)
    want = HDBSCAN(min_cluster_size=50, min_samples=10).fit_predict(one_blob)
    assert np.all(want == -1)  # oracle sanity
    assert np.all(got == -1)


def test_cluster_removal_uses_native_hdbscan(rng):
    """The harness cluster-removal path runs on the native implementation."""
    import vfmreg_tpu.pipeline.registration_node as rn

    assert "sklearn" not in open(rn.__file__).read().split("def _apply_cluster_removal")[1].split("def ")[0]


def test_hdbscan_with_duplicate_points(rng):
    """Exact duplicates create zero-distance merges (infinite lambda); the
    stability accounting must clamp, not go negative."""
    blob = rng.normal(0, 0.5, (80, 3))
    pts = np.concatenate([blob, blob[:20], rng.normal(8, 0.5, (80, 3))])
    labels = hdbscan_labels(pts, min_cluster_size=30, min_samples=5)
    assert len(set(labels[labels >= 0])) == 2
