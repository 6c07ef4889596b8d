"""Utils: stacked quantizer, GMM, bits, samplers, reordering, host top-k,
kmeans tree (reference test analogs in respective modules)."""

import numpy as np
import pytest

from scann_tpu import BruteForceSearcher, DenseDataset
from scann_tpu.hashes.codebook import Codebook, CodebookConfig
from scann_tpu.hashes.stacked import AdditiveQuantizer, StackedQuantizer, StackedQuantizerConfig
from scann_tpu.ops.topk_host import FastTopNeighbors, FixedTopK, TopK
from scann_tpu.trees.kmeans_tree import KMeansTree, KMeansTreeConfig
from scann_tpu.utils.bits import (
    BitIterator,
    hamming_distance_batch,
    hamming_distance_bytes,
    log2_ceil,
    next_power_of_two,
    pack_bits,
    popcount,
    popcount_bytes,
    unpack_bits,
)
from scann_tpu.utils.gmm import CovarianceType, GaussianMixture, GmmConfig
from scann_tpu.utils.random import RandomSampler, ReservoirSampler
from scann_tpu.utils.reordering import ReorderingHelper


# ------------------------------------------------------------- stacked PQ


def test_stacked_quantizer_reduces_error(rng):
    x = rng.normal(size=(400, 16)).astype(np.float32)
    one = StackedQuantizer(StackedQuantizerConfig(
        num_levels=1, num_codes=16, num_subspaces=4, seed=0)).train(x)
    two = StackedQuantizer(StackedQuantizerConfig(
        num_levels=2, num_codes=16, num_subspaces=4, seed=0)).train(x)
    e1, e2 = one.reconstruction_error(x), two.reconstruction_error(x)
    assert e2 < e1
    codes = two.encode(x[:7])
    assert codes.shape == (7, 2, 4)
    rec = two.decode(codes)
    assert rec.shape == (7, 16)


def test_additive_quantizer(rng):
    x = rng.normal(size=(300, 8)).astype(np.float32)
    aq = AdditiveQuantizer(num_levels=3, num_codes=16, seed=1).train(x)
    c = aq.encode(x[0])
    assert c.shape == (3, 1)
    assert aq.reconstruction_error(x) < (x ** 2).sum(-1).mean()


# ------------------------------------------------------------------- GMM


@pytest.mark.parametrize("cov", [CovarianceType.DIAGONAL, CovarianceType.FULL,
                                 CovarianceType.SPHERICAL])
def test_gmm_separates_clusters(cov):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(150, 4)) + 5.0
    b = rng.normal(size=(150, 4)) - 5.0
    x = np.concatenate([a, b]).astype(np.float32)
    g = GaussianMixture(GmmConfig(num_components=2, covariance_type=cov,
                                  seed=0)).fit(x)
    labels = g.predict(x)
    # each true cluster maps to one component
    assert len(set(labels[:150])) == 1 and len(set(labels[150:])) == 1
    assert labels[0] != labels[200]
    proba = g.predict_proba(x[:5])
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-6)
    assert np.isfinite(g.bic(x)) and np.isfinite(g.aic(x))
    s = g.sample(50, seed=1)
    assert s.shape == (50, 4)


def test_gmm_bic_prefers_true_k():
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.normal(size=(200, 2)) + off
                        for off in (-6, 0, 6)]).astype(np.float32)
    bics = []
    for k in (1, 3):
        g = GaussianMixture(GmmConfig(num_components=k, seed=0)).fit(x)
        bics.append(g.bic(x))
    assert bics[1] < bics[0]


# ------------------------------------------------------------------- bits


def test_bits():
    assert popcount(0b1011) == 3
    assert popcount_bytes(np.array([0xFF, 0x0F], np.uint8)) == 12
    a = np.array([0b1010], np.uint8)
    b = np.array([0b0110], np.uint8)
    assert hamming_distance_bytes(a, b) == 2
    db = np.array([[0b1010], [0b1011], [0b0000]], np.uint8)
    np.testing.assert_array_equal(hamming_distance_batch(a[0:1], db), [0, 1, 2])
    bits = [True, False, True, True]
    packed = pack_bits(bits)
    np.testing.assert_array_equal(unpack_bits(packed, 4), bits)
    assert list(BitIterator(np.array([0b101, 0b1], np.uint8))) == [0, 2, 8]
    assert next_power_of_two(17) == 32 and next_power_of_two(1) == 1
    assert log2_ceil(9) == 4 and log2_ceil(8) == 3


# ---------------------------------------------------------------- samplers


def test_random_sampler():
    s = RandomSampler.with_seed(42)
    idx = s.sample_indices(100, 10)
    assert len(idx) == len(set(idx.tolist())) == 10
    assert s.sample_indices(5, 10).shape == (5,)
    s2 = RandomSampler.with_seed(42)
    np.testing.assert_array_equal(idx, s2.sample_indices(100, 10))
    assert 0.0 <= s.random_f32() < 1.0
    wr = s.sample_with_replacement(3, 20)
    assert len(wr) == 20 and wr.max() < 3


def test_reservoir_sampler():
    r = ReservoirSampler(10, seed=0)
    r.extend(range(1000))
    assert len(r.items) == 10 and r.seen == 1000
    assert all(0 <= x < 1000 for x in r.items)
    # statistically spread beyond the first 10
    assert max(r.items) > 50


# ---------------------------------------------------------------- reordering


def test_reordering_helper(rng):
    db = rng.normal(size=(200, 8)).astype(np.float32)
    ds = DenseDataset(db)
    q = db[17] + 0.01
    cand = np.array([3, 17, 99, 150, -1], dtype=np.int32)
    helper = ReorderingHelper()
    idx, dist = helper.reorder(ds, q, cand, k=3)
    assert idx[0, 0] == 17
    want = ((q - db[17]) ** 2).sum()
    # the matmul norm-trick cancels catastrophically at tiny distances;
    # absolute tolerance is the right check here
    assert dist[0, 0] == pytest.approx(want, abs=1e-5)
    assert -1 not in idx[0][:3] or np.isinf(dist[0][idx[0] == -1]).all()


# ---------------------------------------------------------------- host top-k


@pytest.mark.parametrize("cls", [TopK, FixedTopK])
def test_host_topk(cls, rng):
    dists = rng.random(100).astype(np.float32)
    tk = cls(5)
    for i, d in enumerate(dists):
        tk.push(i, float(d))
    got = tk.drain_sorted() if cls is TopK else tk.results()
    order = np.argsort(dists)[:5]
    assert [i for i, _ in got] == order.tolist()
    assert len(tk._heap if cls is TopK else tk._idx) == (0 if cls is TopK else 5)


def test_fast_top_neighbors_epsilon(rng):
    f = FastTopNeighbors(5, epsilon=0.5)
    dists = rng.random(100).astype(np.float32)
    f.push_batch(range(100), dists)
    got = f.results()
    assert all(d <= 0.5 for _, d in got)
    order = [i for i in np.argsort(dists) if dists[i] <= 0.5][:5]
    assert [i for i, _ in got] == order


def test_topk_threshold(rng):
    tk = TopK(3)
    assert tk.threshold == float("inf")
    for i, d in enumerate([0.5, 0.2, 0.9, 0.1]):
        tk.push(i, d)
    assert tk.threshold == pytest.approx(0.5)


# ---------------------------------------------------------------- kmeans tree


def test_kmeans_tree(clustered_data):
    pts, centers, assign = clustered_data
    t = KMeansTree(KMeansTreeConfig(num_children=4, max_depth=2, seed=42)).build(pts)
    assert t.num_leaves >= 4
    # every point lands in exactly one leaf
    tokens = t.leaf_assignments(len(pts))
    assert (tokens >= 0).all()
    sizes = np.bincount(tokens, minlength=t.num_leaves)
    assert sizes.sum() == len(pts)
    # greedy search finds the leaf containing a cluster's points
    leaf_ids = t.search_leaves(centers[0], 2)
    members = np.nonzero(assign == 0)[0]
    hit = np.isin(tokens[members], leaf_ids).mean()
    assert hit > 0.9


def test_kmeans_tree_candidates(clustered_data):
    pts, centers, assign = clustered_data
    t = KMeansTree(KMeansTreeConfig(num_children=4, max_depth=1, seed=42)).build(pts)
    cand = t.search_candidates(pts[0], k=5)
    assert len(cand) >= 10  # k*2 early stop
    assert 0 in cand or len(cand) > 0
    # exact search restricted to candidates contains the true NN
    d = ((pts[0][None] - pts[cand]) ** 2).sum(-1)
    assert cand[np.argmin(d)] == 0


def test_hierarchical_partitioner(clustered_data):
    from scann_tpu.partitioning import TreePartitioner, TreePartitionerConfig

    pts, centers, assign = clustered_data
    tp = TreePartitioner(TreePartitionerConfig(
        num_partitions=16, num_levels=2, seed=42)).build(DenseDataset(pts))
    assert tp.num_partitions >= 4
    assert tp.partition_sizes().sum() == len(pts)
    pr = tp.partition(centers[0], 1)
    members = set(tp.partition_indices(pr.top_token()).tolist())
    true_members = set(np.nonzero(assign == 0)[0].tolist())
    assert len(members & true_members) / len(true_members) > 0.5
