"""Recall-targeted autotuning: cheapest grid point meeting the target."""

import numpy as np
import pytest

from scann_tpu import (
    BlockSweepConfig,
    BlockSweepSearcher,
    BruteForceSearcher,
    DenseDataset,
    DistanceMeasure,
    TreeXHybridConfig,
    TreeXHybridSearcher,
    autotune,
)
from scann_tpu.hashes.hasher import AsymmetricHasherConfig


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(32, 24)).astype(np.float32) * 3.0
    assign = rng.integers(0, 32, size=4000)
    db = (centers[assign] + rng.normal(size=(4000, 24)) * 0.4).astype(np.float32)
    q = (centers[rng.integers(0, 32, size=32)]
         + rng.normal(size=(32, 24)) * 0.4).astype(np.float32)
    return db, q


def test_autotune_tree_ah_meets_target(clustered):
    db, q = clustered
    s = TreeXHybridSearcher(TreeXHybridConfig(
        num_partitions=32, partitions_to_search=4,
        hash_config=AsymmetricHasherConfig(num_codes=16, num_subspaces=8,
                                           seed=1, max_iterations=5),
    )).build(DenseDataset(db))
    res = autotune(s, q, k=10, target_recall=0.95,
                   p_grid=(2, 4, 8, 16), pre_k_grid=(20, 50, 100))
    assert res.target_met
    assert res.recall >= 0.95
    # re-measure independently with the returned params
    gt, _ = BruteForceSearcher(DenseDataset(db)).search_batched_arrays(q, 10)
    idx, _ = s.search_batched_arrays(q, 10, res.params)
    rec = np.mean([len(set(a.tolist()) & set(g.tolist())) / 10
                   for a, g in zip(idx, gt)])
    assert rec >= 0.95
    # cheapest: no other passing grid point has lower cost
    passing = [e for e in res.table if e.recall >= 0.95]
    assert all(e.cost >= min(x.cost for x in passing) for e in passing)
    best_cost = (res.params.num_leaves_to_search,
                 res.params.pre_reordering_num_neighbors)
    assert best_cost[0] in (2, 4, 8, 16) and best_cost[1] in (20, 50, 100)


def test_autotune_block_sweep_pre_k_only(clustered):
    db, q = clustered
    s = BlockSweepSearcher(DenseDataset(db), BlockSweepConfig(
        block_r=8, tile_n=256, pre_reorder_k=16))
    res = autotune(s, q, k=10, target_recall=0.98,
                   pre_k_grid=(16, 32, 64, 128))
    assert res.target_met and res.recall >= 0.98
    assert res.params.num_leaves_to_search is None
    # the sweep's cost proxy is pre_k alone: the result is the smallest
    # passing pre_k
    passing = sorted(e.params.pre_reordering_num_neighbors
                     for e in res.table if e.recall >= 0.98)
    assert res.params.pre_reordering_num_neighbors == passing[0]


def test_autotune_unreachable_target_reports_best(clustered):
    db, q = clustered
    s = TreeXHybridSearcher(TreeXHybridConfig(
        num_partitions=32, partitions_to_search=2,
        hash_config=AsymmetricHasherConfig(num_codes=16, num_subspaces=8,
                                           seed=1, max_iterations=5),
    )).build(DenseDataset(db))
    res = autotune(s, q, k=10, target_recall=1.01,  # impossible
                   p_grid=(1, 2), pre_k_grid=(10, 20))
    assert not res.target_met
    assert res.recall == max(e.recall for e in res.table)


def test_autotune_cosine_measure(clustered):
    """GT is computed in the searcher's own measure."""
    db, q = clustered
    s = BlockSweepSearcher(DenseDataset(db), BlockSweepConfig(
        distance_measure=DistanceMeasure.COSINE,
        block_r=8, tile_n=256, pre_reorder_k=16))
    res = autotune(s, q, k=10, target_recall=0.9,
                   pre_k_grid=(32, 128))
    assert res.target_met
    gt, _ = BruteForceSearcher(
        DenseDataset(db), DistanceMeasure.COSINE).search_batched_arrays(q, 10)
    idx, _ = s.search_batched_arrays(q, 10, res.params)
    rec = np.mean([len(set(a.tolist()) & set(g.tolist())) / 10
                   for a, g in zip(idx, gt)])
    assert rec >= 0.9
