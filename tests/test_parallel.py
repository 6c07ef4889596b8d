"""Sharded search / training on the 8-device virtual CPU mesh: parity with
single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scann_tpu import BruteForceSearcher, DenseDataset
from scann_tpu.parallel import (
    ShardedBruteForceSearcher,
    make_mesh,
    sharded_kmeans_step,
    shard_rows,
)
from scann_tpu.trees.kmeans import assign_clusters, update_centers


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape["db"] == 8


def test_sharded_search_matches_single(rng):
    db = rng.normal(size=(1000, 16)).astype(np.float32)
    q = rng.normal(size=(12, 16)).astype(np.float32)
    ds = DenseDataset(db)
    gt_idx, gt_dist = BruteForceSearcher(ds).search_batched_arrays(q, 7)
    s = ShardedBruteForceSearcher(ds)
    idx, dist = s.search_batched_arrays(q, 7)
    np.testing.assert_allclose(dist, gt_dist, rtol=1e-4, atol=1e-4)
    # compare by distance (ties may reorder)
    d_at = ((q[:, None, :] - db[idx]) ** 2).sum(-1)
    np.testing.assert_allclose(d_at, gt_dist, rtol=1e-4, atol=1e-4)


def test_sharded_search_n_not_divisible(rng):
    db = rng.normal(size=(1001, 8)).astype(np.float32)  # not divisible by 8
    q = rng.normal(size=(3, 8)).astype(np.float32)
    ds = DenseDataset(db)
    gt_idx, gt_dist = BruteForceSearcher(ds).search_batched_arrays(q, 5)
    idx, dist = ShardedBruteForceSearcher(ds).search_batched_arrays(q, 5)
    np.testing.assert_allclose(dist, gt_dist, rtol=1e-4, atol=1e-4)
    assert (idx < 1001).all() and (idx >= 0).all()


def test_sharded_k_larger_than_shard(rng):
    """k bigger than one shard's row count exercises local clamping."""
    db = rng.normal(size=(64, 4)).astype(np.float32)  # 8 rows/shard
    q = rng.normal(size=(2, 4)).astype(np.float32)
    ds = DenseDataset(db)
    gt_idx, gt_dist = BruteForceSearcher(ds).search_batched_arrays(q, 20)
    idx, dist = ShardedBruteForceSearcher(ds).search_batched_arrays(q, 20)
    # merged results can only contain 8 per shard = 64 total; k=20 fine
    np.testing.assert_allclose(dist, gt_dist, rtol=1e-4, atol=1e-4)


def test_sharded_kmeans_step_matches_single(rng):
    # 501 rows: NOT a multiple of the 8-device mesh, so shard_rows pads —
    # the step must mask the padding rows out of counts/centers/inertia
    data = rng.normal(size=(501, 8)).astype(np.float32)
    centers = data[:10].copy()
    mesh = make_mesh()
    step = sharded_kmeans_step(mesh, k=10)
    data_sh, n = shard_rows(mesh, jnp.asarray(data))
    new_c, counts, inertia = step(data_sh, jnp.asarray(centers),
                                  jnp.int32(n))
    assert float(np.asarray(counts).sum()) == 501

    assign, min_d = assign_clusters(jnp.asarray(data), jnp.asarray(centers))
    ref_c, ref_counts = update_centers(jnp.asarray(data), assign, 10)
    # empty-cluster reseed differs (sharded keeps old center); none empty here
    assert (np.asarray(counts) > 0).all()
    np.testing.assert_allclose(np.asarray(new_c), np.asarray(ref_c), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(ref_counts), rtol=1e-5)
    np.testing.assert_allclose(float(inertia), float(jnp.sum(min_d)), rtol=1e-4)


def test_2d_mesh_query_sharding(rng):
    """Query-batch DP x database sharding on a 2x4 mesh."""
    from scann_tpu.parallel.sharded import sharded_search_kernel
    from scann_tpu.ops.distances import DistanceMeasure
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(axis_names=("q", "db"), shape=(2, 4))
    db = rng.normal(size=(256, 8)).astype(np.float32)
    q = rng.normal(size=(16, 8)).astype(np.float32)
    kern = sharded_search_kernel(mesh, DistanceMeasure.SQUARED_L2, 5,
                                 db_axis="db", q_axis="q")
    db_dev = jax.device_put(jnp.asarray(db), NamedSharding(mesh, P("db", None)))
    norms = jnp.sum(jnp.asarray(db) ** 2, axis=1)
    norms_dev = jax.device_put(norms, NamedSharding(mesh, P("db")))
    q_dev = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("q", None)))
    dists, idx = kern(db_dev, norms_dev, jnp.int32(256), q_dev)

    ds = DenseDataset(db)
    gt_idx, gt_dist = BruteForceSearcher(ds).search_batched_arrays(q, 5)
    np.testing.assert_allclose(np.asarray(dists), gt_dist, rtol=1e-4, atol=1e-4)


def test_sharded_bf_honors_epsilon(rng):
    """The sharded exact searcher applies effective_epsilon() to its
    returned distances exactly like the single-device BruteForceSearcher
    (regression: SearchParameters were silently ignored)."""
    from scann_tpu import SearchParameters

    db = rng.normal(size=(600, 8)).astype(np.float32)
    q = rng.normal(size=(5, 8)).astype(np.float32)
    ds = DenseDataset(db)
    s = ShardedBruteForceSearcher(ds)
    _, d_all = s.search_batched_arrays(q, 5)
    eps = float(np.median(d_all[:, 2]))
    p = SearchParameters(pre_reordering_epsilon=eps)
    i_sh, d_sh = s.search_batched_arrays(q, 5, p)
    i_bf, d_bf = BruteForceSearcher(ds).search_batched_arrays(q, 5, p)
    np.testing.assert_array_equal(i_sh, i_bf)
    kept = i_sh >= 0
    assert kept.any() and (~kept).any()
    assert np.all(d_sh[kept] <= eps + 1e-6)


def test_sharded_kernel_rejects_unreachable_k(rng):
    """Direct kernel use with k beyond the gathered candidate width fails
    with a typed, explanatory error at trace time (not an opaque top_k
    failure)."""
    from scann_tpu import ScannError
    from scann_tpu.parallel.sharded import sharded_search_kernel
    from scann_tpu.ops.distances import DistanceMeasure

    db = rng.normal(size=(64, 8)).astype(np.float32)
    mesh = make_mesh()
    db_sh, n = shard_rows(mesh, db)
    norms = jnp.sum(jnp.asarray(db) ** 2, axis=1)
    norms_sh, _ = shard_rows(mesh, np.asarray(norms))
    kern = sharded_search_kernel(mesh, DistanceMeasure.SQUARED_L2, k=100)
    with pytest.raises(ScannError):
        kern(db_sh, norms_sh, jnp.int32(n),
             jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32)))
