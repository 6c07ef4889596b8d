"""Tree partitioner + partitioned search: tokenization invariants, query-side
selection, recall with enough leaves (reference test analog:
tests/unit_tests.rs partitioning_tests)."""

import dataclasses

import numpy as np
import pytest

from scann_tpu import BruteForceSearcher, DenseDataset, SearchParameters
from scann_tpu.models.partitioned import PartitionedSearcher
from scann_tpu.partitioning import (
    DatabaseTokenization,
    TreePartitioner,
    TreePartitionerConfig,
)


def test_tokenization_csr():
    tokens = np.array([2, 0, 2, 1, 0, 2], dtype=np.int32)
    tk = DatabaseTokenization(tokens, 3)
    assert tk.partition_sizes.tolist() == [2, 1, 3]
    assert set(tk.partition_indices(0).tolist()) == {1, 4}
    assert set(tk.partition_indices(2).tolist()) == {0, 2, 5}
    leaves = np.asarray(tk.padded_leaves())
    assert leaves.shape[0] == 3
    assert (np.sort(leaves[1])[-1:] == [3]).all()
    # padding is -1
    assert (leaves[1] == -1).sum() == leaves.shape[1] - 1


def test_build_and_partition(clustered_data):
    pts, centers, assign = clustered_data
    tp = TreePartitioner(TreePartitionerConfig(num_partitions=8, seed=42)).build(
        DenseDataset(pts)
    )
    assert tp.num_partitions == 8
    assert tp.partition_sizes().sum() == len(pts)
    # a query at a true center selects the partition holding its points
    pr = tp.partition(centers[0], 1)
    members = set(tp.partition_indices(pr.top_token()).tolist())
    true_members = set(np.nonzero(assign == 0)[0].tolist())
    assert len(members & true_members) / len(true_members) > 0.9


def test_partition_distances_sorted(clustered_data):
    pts, centers, _ = clustered_data
    tp = TreePartitioner(TreePartitionerConfig(num_partitions=8, seed=42)).build(
        DenseDataset(pts)
    )
    pr = tp.partition(centers[3], 5)
    assert (np.diff(pr.distances) >= -1e-5).all()
    assert len(set(pr.tokens.tolist())) == 5


def test_partitioned_search_recall(rng):
    db = rng.normal(size=(2000, 24)).astype(np.float32)
    q = rng.normal(size=(20, 24)).astype(np.float32)
    ds = DenseDataset(db)
    gt, _ = BruteForceSearcher(ds).search_batched_arrays(q, 10)
    s = PartitionedSearcher(
        ds, config=TreePartitionerConfig(num_partitions=20, seed=42),
        num_partitions_to_search=8,
    )
    idx, dist = s.search_batched_arrays(q, 10)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, gt)])
    assert recall >= 0.85
    assert (np.diff(dist, axis=1) >= -1e-5).all()


def test_searching_all_partitions_is_exact(rng):
    db = rng.normal(size=(500, 16)).astype(np.float32)
    q = rng.normal(size=(10, 16)).astype(np.float32)
    ds = DenseDataset(db)
    gt_idx, gt_dist = BruteForceSearcher(ds).search_batched_arrays(q, 5)
    s = PartitionedSearcher(
        ds, config=TreePartitionerConfig(num_partitions=10, seed=42),
        num_partitions_to_search=10,
    )
    idx, dist = s.search_batched_arrays(q, 5)
    np.testing.assert_allclose(dist, gt_dist, rtol=1e-3, atol=1e-3)


def test_leaves_override_via_params(rng):
    db = rng.normal(size=(400, 8)).astype(np.float32)
    ds = DenseDataset(db)
    s = PartitionedSearcher(
        ds, config=TreePartitionerConfig(num_partitions=16, seed=42),
        num_partitions_to_search=1,
    )
    q = db[:5]
    # with all leaves searched results match brute force
    gt, _ = BruteForceSearcher(ds).search_batched_arrays(q, 3)
    idx, _ = s.search_batched_arrays(q, 3, SearchParameters(num_leaves_to_search=16))
    assert np.mean([len(set(a) & set(b)) / 3 for a, b in zip(idx, gt)]) == 1.0


def test_missing_results_marked(rng):
    """k larger than candidates in searched leaves -> -1 indices."""
    db = rng.normal(size=(64, 8)).astype(np.float32)
    ds = DenseDataset(db)
    s = PartitionedSearcher(
        ds, config=TreePartitionerConfig(num_partitions=16, seed=42),
        num_partitions_to_search=1,
    )
    idx, dist = s.search_batched_arrays(db[:3], 30)
    assert (idx == -1).any()
    assert np.isinf(dist[idx == -1]).all()
    # valid prefix is sorted and real
    for row_i, row_d in zip(idx, dist):
        m = row_i >= 0
        assert (np.diff(row_d[m]) >= -1e-5).all()


def test_spilling_multi_assignment(rng):
    db = rng.normal(size=(300, 8)).astype(np.float32)
    base = TreePartitioner(TreePartitionerConfig(num_partitions=8, seed=42)).build(
        DenseDataset(db))
    spill = TreePartitioner(TreePartitionerConfig(
        num_partitions=8, seed=42, spilling=True, spilling_threshold=0.5)).build(
        DenseDataset(db))
    # spilled tokenization holds strictly more (point, partition) entries
    assert spill.tokenization.partition_sizes.sum() > base.tokenization.partition_sizes.sum()
    # each point still appears in its primary partition
    for t in range(8):
        assert set(base.tokenization.partition_indices(t)) <= set(
            spill.tokenization.partition_indices(t))


def test_spilling_improves_recall_at_fixed_leaves(rng):
    from scann_tpu.models.partitioned import PartitionedSearcher
    from scann_tpu import BruteForceSearcher

    db = rng.normal(size=(3000, 16)).astype(np.float32)
    q = rng.normal(size=(30, 16)).astype(np.float32)
    ds = DenseDataset(db)
    gt, _ = BruteForceSearcher(ds).search_batched_arrays(q, 10)

    def recall(spilling):
        tp = TreePartitioner(TreePartitionerConfig(
            num_partitions=30, seed=42, spilling=spilling,
            spilling_threshold=0.4)).build(ds)
        s = PartitionedSearcher(ds, partitioner=tp, num_partitions_to_search=3)
        idx, _ = s.search_batched_arrays(q, 10)
        return np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, gt)])

    assert recall(True) >= recall(False)


def test_balancing_caps_partition_sizes(rng):
    # heavily skewed data: one dense blob + sparse spread
    blob = rng.normal(size=(800, 8)).astype(np.float32) * 0.05
    spread = rng.normal(size=(200, 8)).astype(np.float32) * 5.0 + 10.0
    db = np.concatenate([blob, spread]).astype(np.float32)
    base = TreePartitioner(TreePartitionerConfig(num_partitions=16, seed=42)).build(
        DenseDataset(db))
    cap = 150
    bal = TreePartitioner(TreePartitionerConfig(
        num_partitions=16, seed=42, max_partition_size=cap)).build(DenseDataset(db))
    assert bal.partition_sizes().max() <= base.partition_sizes().max()
    assert bal.partition_sizes().sum() == len(db)
    # balanced index still searches correctly
    from scann_tpu.models.partitioned import PartitionedSearcher
    s = PartitionedSearcher(DenseDataset(db), partitioner=bal,
                            num_partitions_to_search=bal.num_partitions)
    idx, _ = s.search_batched_arrays(db[:5], 1)
    assert (idx[:, 0] == np.arange(5)).all()


def test_straggler_split_hard_caps_partition_sizes(rng):
    """The straggler split must bound EVERY partition by the cap exactly —
    including Zipf hotspots whose points exhaust all demote fallbacks —
    with all points still assigned exactly once and search still exact."""
    # pathological hotspot: 900 near-identical points — demotion alone
    # cannot spread them without shipping points to far centroids
    blob = rng.normal(size=(900, 8)).astype(np.float32) * 0.01
    spread = rng.normal(size=(100, 8)).astype(np.float32) * 5.0 + 10.0
    db = np.concatenate([blob, spread]).astype(np.float32)
    cap = 100
    cfg = TreePartitionerConfig(
        num_partitions=10, seed=42, max_partition_size=cap,
        balance_rounds=0, cap_enforce_rounds=2, cap_enforce_choices=2)
    nosplit = TreePartitioner(dataclasses.replace(
        cfg, split_stragglers=False)).build(DenseDataset(db))
    assert nosplit.partition_sizes().max() > cap  # the regime split fixes
    tp = TreePartitioner(cfg).build(DenseDataset(db))
    assert tp.partition_sizes().max() <= cap
    assert tp.partition_sizes().sum() == len(db)
    assert tp.num_partitions >= 10
    # split children carry their own mean centroids: searching all
    # partitions is still exact
    from scann_tpu.models.partitioned import PartitionedSearcher
    s = PartitionedSearcher(DenseDataset(db), partitioner=tp,
                            num_partitions_to_search=tp.num_partitions)
    idx, _ = s.search_batched_arrays(db[::97], 1)
    assert (idx[:, 0] == np.arange(0, len(db), 97)).all()


def test_spilling_results_unique(rng):
    """Regression: a spilled point probed via two of its leaves must be
    returned once — duplicates silently consumed result slots."""
    from scann_tpu import BruteForceSearcher
    from scann_tpu.models.partitioned import PartitionedSearcher

    db = rng.normal(size=(2000, 16)).astype(np.float32)
    q = rng.normal(size=(50, 16)).astype(np.float32)
    ds = DenseDataset(db)
    tp = TreePartitioner(TreePartitionerConfig(
        num_partitions=16, seed=42, spilling=True,
        spilling_threshold=0.8)).build(ds)
    assert tp.tokenization.max_multiplicity > 1
    s = PartitionedSearcher(ds, partitioner=tp, num_partitions_to_search=8)
    idx, dist = s.search_batched_arrays(q, 10)
    for row in idx:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real), row
    # still exact over probed partitions: equal to brute force restricted
    gt, _ = BruteForceSearcher(ds).search_batched_arrays(q, 10)
    rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, gt)])
    assert rec > 0.5  # 8/16 partitions probed with spilling


def test_tokenize_host_chunking_matches_single_call(rng):
    """Host-level tokenize chunking (caps the per-program input copy — a
    single whole-database call duplicates the full [N, D] array inside the
    program: measured 9.5 GB second copy -> OOM at 20M x 100d) must give
    identical assignments to the single-call path."""
    from scann_tpu.partitioning.tree_partitioner import (
        TreePartitioner,
        TreePartitionerConfig,
    )

    data = rng.normal(size=(3000, 16)).astype(np.float32)
    p = TreePartitioner(TreePartitionerConfig(num_partitions=16, seed=3))
    p.build(data)
    tok_single = p.tokenize(data)
    try:
        p._TOKENIZE_ROWS = 700  # force 5 host-level chunks
        tok_chunked = p.tokenize(data)
    finally:
        del p._TOKENIZE_ROWS
    np.testing.assert_array_equal(tok_single, tok_chunked)


def test_soar_secondaries_respect_partition_cap(rng):
    """SOAR spilling must not re-skew partitions past the cap the balance
    rounds enforced: total (primary+secondary) size stays <= 2*cap, so
    l_cap padding (every query's leaf-scoring cost) stays bounded on
    Zipf-mass data where secondaries funnel into central partitions."""
    from scann_tpu.partitioning.tree_partitioner import (
        TreePartitioner,
        TreePartitionerConfig,
    )

    # heavy central mass: most points near one center
    centers = rng.normal(size=(16, 16)).astype(np.float32) * 2
    weights = np.array([0.5] + [0.5 / 15] * 15)
    assign = rng.choice(16, size=4000, p=weights)
    data = (centers[assign] + rng.normal(size=(4000, 16)) * 0.5).astype(np.float32)

    p = TreePartitioner(TreePartitionerConfig(
        num_partitions=16, seed=3, max_partition_size=200,
        spilling=True, spilling_mode="soar"))
    p.build(data)
    cap = p._cap_value(len(data))
    prim_max = int(np.bincount(p.tokenization.tokens).max())
    # invariant: secondaries add at most (2*cap - prim) per partition, so
    # total size is bounded by max(prim_max, 2*cap) — balance is
    # best-effort on primaries, spilling must not add skew on top
    assert p.tokenization.max_partition_size <= max(prim_max, 2 * cap), (
        p.tokenization.max_partition_size, prim_max, cap)
    # spilling still happened for most points
    assert p.tokenization.max_multiplicity == 2


def test_lbg_grow_centers_small_dataset_bucket_pad():
    """Bucket-padding to 256 on a dataset with fewer than 256 rows must
    sample with replacement instead of crashing (regression: replace=False
    raised 'Cannot take a larger sample than population')."""
    from scann_tpu.partitioning.tree_partitioner import lbg_grow_centers

    rng = np.random.default_rng(0)
    data = rng.normal(size=(200, 8)).astype(np.float32)
    tokens = np.zeros(200, np.int32)  # everything in partition 0
    centers = data[:8].copy()
    grown = lbg_grow_centers(data, tokens, centers, cap=37, rng=rng)
    assert grown is not None
    assert grown.shape[0] == 256  # bucket-padded
    # under the cap -> None (stop signal)
    tokens2 = np.arange(200, dtype=np.int32) % 8
    assert lbg_grow_centers(data, tokens2, centers, cap=37, rng=rng) is None
