"""Stress & invariant tests (reference analog: tests/stress_tests.rs):
seeded random datasets to 10k x 128d, recall verification vs exhaustive
ground truth, sortedness invariants, concurrent query safety."""

import threading

import numpy as np
import pytest

from scann_tpu import (
    BruteForceSearcher,
    DenseDataset,
    ScalarQuantizedBruteForceSearcher,
    Scann,
    ScannBuilder,
    SearchParameters,
)
from scann_tpu.ops.distances import DistanceMeasure, pairwise_distances


@pytest.fixture(scope="module")
def big_db():
    rng = np.random.default_rng(42)
    return rng.normal(size=(10_000, 128)).astype(np.float32)


def exhaustive_gt(db, q, k):
    d = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1)[:, :k]


def test_brute_force_recall_10k_128d(big_db):
    """(reference: stress_tests.rs:326-363)."""
    rng = np.random.default_rng(1)
    q = rng.normal(size=(50, 128)).astype(np.float32)
    gt = exhaustive_gt(big_db, q, 10)
    idx, dist = BruteForceSearcher(DenseDataset(big_db)).search_batched_arrays(q, 10)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, gt)])
    assert recall == 1.0


def test_sortedness_invariant_all_modes(big_db):
    """(reference: stress_tests.rs:27-37)."""
    rng = np.random.default_rng(2)
    q = rng.normal(size=(8, 128)).astype(np.float32)
    db = DenseDataset(big_db[:3000])
    searchers = [
        BruteForceSearcher(db),
        ScalarQuantizedBruteForceSearcher(db),
        (ScannBuilder().tree(30, 30).hash(32, 16).reorder(100).build(db)),
    ]
    for s in searchers:
        _, dist = s.search_batched_arrays(q, 20)
        finite = np.where(np.isfinite(dist), dist, np.inf)
        assert (np.diff(finite, axis=1) >= -1e-4).all(), type(s).__name__


def test_concurrent_queries_safe(big_db):
    """(reference: stress_tests.rs:257-297)."""
    s = BruteForceSearcher(DenseDataset(big_db[:2000]))
    rng = np.random.default_rng(3)
    queries = rng.normal(size=(8, 16, 128)).astype(np.float32)
    gt = [exhaustive_gt(big_db[:2000], q, 5) for q in queries]
    errors = []

    def worker(t):
        try:
            for _ in range(5):
                idx, _ = s.search_batched_arrays(queries[t], 5)
                recall = np.mean([len(set(a) & set(b)) / 5
                                  for a, b in zip(idx, gt[t])])
                assert recall == 1.0
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_quantized_recall_10k_128d(big_db):
    rng = np.random.default_rng(4)
    q = rng.normal(size=(30, 128)).astype(np.float32)
    gt = exhaustive_gt(big_db, q, 10)
    idx, _ = ScalarQuantizedBruteForceSearcher(
        DenseDataset(big_db)).search_batched_arrays(q, 10)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, gt)])
    assert recall >= 0.9


def test_pairwise_distances(rng):
    x = rng.normal(size=(20, 8)).astype(np.float32)
    d = np.asarray(pairwise_distances(DistanceMeasure.SQUARED_L2, x))
    assert d.shape == (20, 20)
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-4)
    np.testing.assert_allclose(d, d.T, atol=1e-4)


def test_duplicate_heavy_dataset(rng):
    """Many duplicate points: ties handled, self found."""
    base = rng.normal(size=(10, 8)).astype(np.float32)
    db = np.repeat(base, 50, axis=0)  # 500 points, 50 copies each
    s = BruteForceSearcher(DenseDataset(db))
    idx, dist = s.search_batched_arrays(base, 50)
    for i in range(10):
        # all 50 copies of point i are the nearest 50
        assert set(idx[i]) == set(range(i * 50, (i + 1) * 50))
        np.testing.assert_allclose(dist[i], 0.0, atol=1e-4)
