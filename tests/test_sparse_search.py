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


def test_overlap_coefficient_matches_oracle(sparse_ds, rng):
    """Overlap searcher distance = 1 - the reference coefficient
    (reference: src/distance_measures/sparse.rs:178-196)."""
    from scann_tpu.ops.distances import overlap_coefficient_sparse

    ds, sets = sparse_ds
    s = SparseBruteForceSearcher(ds, DistanceMeasure.OVERLAP)
    q = sorted(rng.choice(64, size=6, replace=False).tolist())
    res = s.search_sparse(q, k=5)
    oracle = sorted(
        ((1.0 - overlap_coefficient_sparse(q, sorted(st)), i)
         for i, st in enumerate(sets)))
    got = [round(n.distance, 5) for n in res.neighbors]
    want = [round(d, 5) for d, _ in oracle[:5]]
    assert got == pytest.approx(want, abs=1e-4)
    # a subset of a larger set overlaps fully: coefficient 1, distance 0
    sub = sorted(sets[3])[:2]
    r2 = s.search_sparse(sub, k=1)
    assert r2.neighbors[0].distance == pytest.approx(0.0, abs=1e-6)


def test_overlap_empty_sets_reference_semantics():
    from scann_tpu.ops.distances import overlap_coefficient_sparse

    assert overlap_coefficient_sparse([], [1, 2]) == 0.0
    assert overlap_coefficient_sparse([1], []) == 0.0
    assert overlap_coefficient_sparse([1, 2], [2, 3, 4]) == pytest.approx(0.5)


def test_weighted_jaccard_matches_oracle(rng):
    """Weighted-Jaccard searcher vs the pairwise reference formula
    (reference: src/distance_measures/sparse.rs:101-147), including
    negative values (scored by absolute value)."""
    from scann_tpu.ops.distances import weighted_jaccard_distance_sparse
    from scann_tpu import SparseDataset

    ds = SparseDataset(64)
    points = []
    for _ in range(40):
        nnz = rng.integers(2, 10)
        idx = np.sort(rng.choice(64, size=nnz, replace=False))
        vals = rng.normal(size=nnz).astype(np.float32)  # signed on purpose
        ds.append(idx, vals)
        points.append((idx, vals))
    s = SparseBruteForceSearcher(ds, DistanceMeasure.WEIGHTED_JACCARD)
    q_idx = np.sort(rng.choice(64, size=7, replace=False))
    q_vals = rng.normal(size=7).astype(np.float32)
    res = s.search_sparse(q_idx, k=5, values=q_vals)
    oracle = sorted(
        (weighted_jaccard_distance_sparse(q_vals, q_idx, v, i), j)
        for j, (i, v) in enumerate(points))
    got = [round(n.distance, 5) for n in res.neighbors]
    want = [round(d, 5) for d, _ in oracle[:5]]
    assert got == pytest.approx(want, abs=1e-4)
    # identical vector -> distance 0
    i7, v7 = points[7]
    r2 = s.search_sparse(i7, k=1, values=v7)
    assert r2.neighbors[0].index == 7
    assert r2.neighbors[0].distance == pytest.approx(0.0, abs=1e-5)


def test_weighted_jaccard_chunked_scan_matches_single_chunk(rng):
    """The D-chunked lax.scan path must agree with a one-chunk run (the
    chunking is a memory shape, not a math change)."""
    from scann_tpu.models.sparse_brute_force import _weighted_jaccard_kernel
    import jax.numpy as jnp

    n, d, b = 24, 48, 4
    x = np.abs(rng.normal(size=(n, d))).astype(np.float32)
    q = np.abs(rng.normal(size=(b, d))).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(x.sum(1)), jnp.int32(n),
            jnp.asarray(q), jnp.asarray(q.sum(1)))
    v1, i1 = _weighted_jaccard_kernel(*args, k=5, chunk_d=d)
    v2, i2 = _weighted_jaccard_kernel(*args, k=5, chunk_d=8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_weighted_jaccard_pairwise_reference_edges():
    from scann_tpu.ops.distances import weighted_jaccard_distance_sparse as wj

    # both empty -> 0.0 (reference returns 0.0 when max_sum == 0)
    assert wj([], [], [], []) == 0.0
    # disjoint -> 1.0
    assert wj([1.0], [0], [2.0], [1]) == pytest.approx(1.0)
    # identical -> 0.0
    assert wj([1.0, 2.0], [0, 3], [1.0, 2.0], [0, 3]) == pytest.approx(0.0)
    # hand case: a={0:1, 1:3}, b={1:2, 2:4}:
    # min over intersection {1} = min(3,2)=2; max = |a|+|b|-min = 4+6-2 = 8
    assert wj([1.0, 3.0], [0, 1], [2.0, 4.0], [1, 2]) == pytest.approx(1 - 2 / 8)
