"""Index save/load round-trips: identical results without retraining."""

import numpy as np
import pytest

from scann_tpu import (
    BruteForceSearcher,
    DenseDataset,
    DistanceMeasure,
    ScalarQuantizedBruteForceSearcher,
    SearchParameters,
)
from scann_tpu.hashes import AsymmetricHasher, AsymmetricHasherConfig
from scann_tpu.io import load_index, save_index
from scann_tpu.models.partitioned import PartitionedSearcher
from scann_tpu.models.scann import Scann
from scann_tpu.models.tree_x_hybrid import TreeXHybridConfig, TreeXHybridSearcher
from scann_tpu.partitioning import TreePartitionerConfig


@pytest.fixture
def db(rng):
    return rng.normal(size=(400, 16)).astype(np.float32)


def _same_results(a, b, q, k=5, params=None):
    ia, da = a.search_batched_arrays(q, k, params)
    ib, db_ = b.search_batched_arrays(q, k, params)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db_, rtol=1e-5)


def test_brute_force_round_trip(tmp_path, db, rng):
    s = BruteForceSearcher(DenseDataset(db), DistanceMeasure.COSINE)
    p = str(tmp_path / "bf.npz")
    save_index(p, s)
    s2 = load_index(p)
    _same_results(s, s2, rng.normal(size=(4, 16)).astype(np.float32))


def test_scalar_quantized_round_trip(tmp_path, db, rng):
    s = ScalarQuantizedBruteForceSearcher(DenseDataset(db))
    p = str(tmp_path / "sq.npz")
    save_index(p, s)
    s2 = load_index(p)
    # byte-identical codes and calibration
    np.testing.assert_array_equal(s.quantized_dataset.codes, s2.quantized_dataset.codes)
    assert s2.quantized_dataset.quantizer.scale == pytest.approx(
        s.quantized_dataset.quantizer.scale)
    _same_results(s, s2, rng.normal(size=(4, 16)).astype(np.float32))


def test_partitioned_round_trip(tmp_path, db, rng):
    s = PartitionedSearcher(DenseDataset(db),
                            config=TreePartitionerConfig(num_partitions=8, seed=42),
                            num_partitions_to_search=4)
    p = str(tmp_path / "part.npz")
    save_index(p, s)
    s2 = load_index(p)
    _same_results(s, s2, rng.normal(size=(4, 16)).astype(np.float32))


def test_hashed_round_trip(tmp_path, db, rng):
    h = AsymmetricHasher(AsymmetricHasherConfig(
        num_codes=16, num_subspaces=4, seed=42)).build(DenseDataset(db))
    p = str(tmp_path / "ah.npz")
    save_index(p, h)
    h2 = load_index(p)
    np.testing.assert_array_equal(h.codes, h2.codes)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    _same_results(h, h2, q)
    # reordering path survives (dataset stored)
    _same_results(h, h2, q, params=SearchParameters(pre_reordering_num_neighbors=50))


def test_tree_ah_round_trip(tmp_path, db, rng):
    s = TreeXHybridSearcher(TreeXHybridConfig(
        num_partitions=8, partitions_to_search=4,
        hash_config=AsymmetricHasherConfig(num_codes=16, num_subspaces=4, seed=42),
    )).build(DenseDataset(db))
    p = str(tmp_path / "tah.npz")
    save_index(p, s)
    s2 = load_index(p)
    np.testing.assert_array_equal(s.codes, s2.codes)
    np.testing.assert_allclose(s.partitioner.centers, s2.partitioner.centers)
    _same_results(s, s2, rng.normal(size=(4, 16)).astype(np.float32))


def test_facade_round_trip(tmp_path, db, rng):
    s = Scann.brute_force(DenseDataset(db))
    p = str(tmp_path / "facade.npz")
    save_index(p, s)
    s2 = load_index(p)  # loads the inner searcher
    _same_results(s.impl, s2, rng.normal(size=(2, 16)).astype(np.float32))


def test_partitioned_round_trip_with_spilling(tmp_path, db, rng):
    tp_cfg = TreePartitionerConfig(num_partitions=8, seed=42, spilling=True,
                                   spilling_threshold=0.5)
    from scann_tpu.partitioning import TreePartitioner
    tp = TreePartitioner(tp_cfg).build(DenseDataset(db))
    s = PartitionedSearcher(DenseDataset(db), partitioner=tp,
                            num_partitions_to_search=4)
    p = str(tmp_path / "spill.npz")
    save_index(p, s)
    s2 = load_index(p)
    # spilled multi-assignments preserved exactly
    np.testing.assert_array_equal(
        s.partitioner.tokenization.point_indices,
        s2.partitioner.tokenization.point_indices)
    np.testing.assert_array_equal(
        s.partitioner.tokenization.offsets, s2.partitioner.tokenization.offsets)
    _same_results(s, s2, rng.normal(size=(4, 16)).astype(np.float32))


def test_block_sweep_round_trip(tmp_path, rng):
    from scann_tpu.models.block_sweep import BlockSweepConfig, BlockSweepSearcher

    db = rng.normal(size=(1024, 16)).astype(np.float32)
    s = BlockSweepSearcher(DenseDataset(db), BlockSweepConfig(
        pre_reorder_k=64, block_r=8, tile_n=128, top2=True))
    p = str(tmp_path / "bs.npz")
    save_index(p, s)
    s2 = load_index(p)
    assert isinstance(s2, BlockSweepSearcher)
    assert s2._config.top2 and s2._config.block_r == 8
    q = db[:6]
    i1, d1 = s.search_batched_arrays(q, 5)
    i2, d2 = s2.search_batched_arrays(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
