"""Sparse set-similarity search vs host oracles."""

import numpy as np
import pytest

from scann_tpu import DistanceMeasure, ScannError, SparseDataset
from scann_tpu.models.sparse_brute_force import SparseBruteForceSearcher
from scann_tpu.ops.distances import dice_distance_sparse, jaccard_distance_sparse


@pytest.fixture
def sparse_ds(rng):
    ds = SparseDataset(64)
    sets = []
    for _ in range(50):
        nnz = rng.integers(2, 10)
        idx = np.sort(rng.choice(64, size=nnz, replace=False))
        ds.append(idx, np.ones(nnz, np.float32))
        sets.append(set(idx.tolist()))
    return ds, sets


def test_jaccard_matches_oracle(sparse_ds, rng):
    ds, sets = sparse_ds
    s = SparseBruteForceSearcher(ds, DistanceMeasure.JACCARD)
    q = sorted(rng.choice(64, size=6, replace=False).tolist())
    res = s.search_sparse(q, k=5)
    oracle = sorted(
        ((jaccard_distance_sparse(q, sorted(st)), i) for i, st in enumerate(sets)))
    got = [(round(n.distance, 5), n.index) for n in res]
    want = [(round(d, 5), i) for d, i in oracle[:5]]
    assert [g[0] for g in got] == pytest.approx([w[0] for w in want], abs=1e-4)


def test_dice_and_nzi(sparse_ds, rng):
    ds, sets = sparse_ds
    q = sorted(rng.choice(64, size=6, replace=False).tolist())
    sd = SparseBruteForceSearcher(ds, DistanceMeasure.DICE)
    res = sd.search_sparse(q, k=3)
    d0 = dice_distance_sparse(q, sorted(sets[res.neighbors[0].index]))
    assert res.neighbors[0].distance == pytest.approx(d0, abs=1e-4)

    sn = SparseBruteForceSearcher(ds, DistanceMeasure.NON_ZERO_INTERSECT)
    res2 = sn.search_sparse(q, k=1)
    best = max(range(len(sets)), key=lambda i: len(sets[i] & set(q)))
    assert len(sets[res2.neighbors[0].index] & set(q)) == len(sets[best] & set(q))


def test_exact_self_match(sparse_ds):
    ds, sets = sparse_ds
    s = SparseBruteForceSearcher(ds)
    res = s.search_sparse(sorted(sets[7]), k=1)
    assert res.neighbors[0].distance == pytest.approx(0.0, abs=1e-6)


def test_rejects_dense_measures(sparse_ds):
    ds, _ = sparse_ds
    with pytest.raises(ScannError):
        SparseBruteForceSearcher(ds, DistanceMeasure.SQUARED_L2)
