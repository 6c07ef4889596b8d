"""Sharded flagship searchers on the 8-virtual-device CPU mesh: parity with
the single-device searchers at equal knobs."""

import numpy as np
import pytest

from scann_tpu import BruteForceSearcher, DenseDataset, SearchParameters
from scann_tpu.hashes.hasher import AsymmetricHasher, AsymmetricHasherConfig
from scann_tpu.models.tree_x_hybrid import TreeXHybridConfig, TreeXHybridSearcher
from scann_tpu.parallel.mesh import make_mesh
from scann_tpu.parallel.sharded_flagship import (
    ShardedAsymmetricHasher,
    ShardedTreeXHybridSearcher,
)


def _recall(idx, gt):
    return np.mean([len(set(a.tolist()) & set(b.tolist())) / len(b)
                    for a, b in zip(idx, gt)])


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(24, 32)).astype(np.float32) * 3.0
    assign = rng.integers(0, 24, size=3000)
    db = (centers[assign] + rng.normal(size=(3000, 32)) * 0.5).astype(np.float32)
    q = (centers[rng.integers(0, 24, size=16)]
         + rng.normal(size=(16, 32)) * 0.5).astype(np.float32)
    ds = DenseDataset(db)
    gt, _ = BruteForceSearcher(ds).search_batched_arrays(q, 10)
    return db, q, ds, gt


def test_sharded_ah_sweep_matches_single_device(data):
    db, q, ds, gt = data
    h = AsymmetricHasher(AsymmetricHasherConfig(
        num_codes=16, num_subspaces=8, seed=5)).build(ds)
    sh = ShardedAsymmetricHasher(h, make_mesh(8, axis_names=("db",)))
    params = SearchParameters(pre_reordering_num_neighbors=100)
    i1, d1 = h.search_batched_arrays(q, 10, params)
    i2, d2 = sh.search_batched_arrays(q, 10, params)
    # sharded keeps a full local pre_k per shard: recall >= single device
    assert _recall(i2, gt) >= _recall(i1, gt) - 1e-9
    assert _recall(i2, gt) >= 0.9
    # exact distances for returned ids
    de = ((q[:, None, :] - db[np.maximum(i2, 0)]) ** 2).sum(-1)
    m = i2 >= 0
    np.testing.assert_allclose(d2[m], de[m], rtol=1e-3, atol=1e-3)


def test_sharded_tree_ah_matches_single_device(data):
    db, q, ds, gt = data
    s = TreeXHybridSearcher(TreeXHybridConfig(
        num_partitions=24, partitions_to_search=8,
        hash_config=AsymmetricHasherConfig(num_codes=16, num_subspaces=8, seed=5),
    )).build(ds)
    sh = ShardedTreeXHybridSearcher(s, make_mesh(8, axis_names=("db",)))
    params = SearchParameters(pre_reordering_num_neighbors=120)
    i1, _ = s.search_batched_arrays(q, 10, params)
    i2, d2 = sh.search_batched_arrays(q, 10, params)
    r1, r2 = _recall(i1, gt), _recall(i2, gt)
    assert r2 >= r1 - 0.02, (r1, r2)
    assert r2 >= 0.9
    de = ((q[:, None, :] - db[np.maximum(i2, 0)]) ** 2).sum(-1)
    m = i2 >= 0
    np.testing.assert_allclose(d2[m], de[m], rtol=1e-3, atol=1e-3)


def test_sharded_tree_ah_spilling_unique(data):
    db, q, ds, gt = data
    s = TreeXHybridSearcher(TreeXHybridConfig(
        num_partitions=24, partitions_to_search=8,
        spilling=True, spilling_threshold=0.6,
        hash_config=AsymmetricHasherConfig(num_codes=16, num_subspaces=8, seed=5),
    )).build(ds)
    assert s.partitioner.tokenization.max_multiplicity > 1
    sh = ShardedTreeXHybridSearcher(s, make_mesh(8, axis_names=("db",)))
    i2, _ = sh.search_batched_arrays(
        q, 10, SearchParameters(pre_reordering_num_neighbors=120))
    for row in i2:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real), row
    assert _recall(i2, gt) >= 0.9


def test_sharded_tree_ah_uneven_mesh(data):
    """3 shards: bin packing with a partition count not divisible by it."""
    db, q, ds, gt = data
    s = TreeXHybridSearcher(TreeXHybridConfig(
        num_partitions=24, partitions_to_search=8,
        hash_config=AsymmetricHasherConfig(num_codes=16, num_subspaces=8, seed=5),
    )).build(ds)
    sh = ShardedTreeXHybridSearcher(s, make_mesh(3, axis_names=("db",)))
    i2, _ = sh.search_batched_arrays(
        q, 10, SearchParameters(pre_reordering_num_neighbors=120))
    assert _recall(i2, gt) >= 0.9
