"""Sharded-build scale certification (VERDICT r4 next #6).

Times `sharded_tree_ah_build` against the single-device build at 5M on
the real chip (a 1-device mesh — the correctness of N-way sharding is
covered by the 8-device CPU tests; the claim to verify HERE is that the
sharded build-path programs do not regress single-chip build wall-clock,
which BASELINE counts), plus the warm-start save/load round trip at the
same scale (the serving-restart cost `save_layout` exists to kill).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/sharded_build_5m.py
"""

import os
import time

import numpy as np

N = int(os.environ.get("SB_N", 5_000_000))
D, K, B = 100, 10, 1024
NC = max(N // 250, 8)
N_PARTS = int(os.environ.get("SB_PARTS", max(256, N // 625)))
SEED = 7


def log(*a):
    print(*a, flush=True)


def main():
    import jax

    from scann_tpu import DenseDataset
    from scann_tpu.hashes.hasher import AsymmetricHasherConfig
    from scann_tpu.models.searcher import SearchParameters
    from scann_tpu.models.tree_x_hybrid import (
        TreeXHybridConfig,
        TreeXHybridSearcher,
    )
    from scann_tpu.parallel.mesh import make_mesh
    from scann_tpu.parallel.sharded_flagship import (
        ShardedTreeXHybridSearcher,
    )
    from scann_tpu.utils.benchmarking import recall_at_k

    t0 = time.perf_counter()
    cache_db = f"/tmp/crossover_{N}_{D}_{SEED}_db.npy"
    if os.path.exists(cache_db):
        db = np.load(cache_db)
        log(f"loaded cached dataset: {time.perf_counter()-t0:.1f}s")
    else:
        rng = np.random.default_rng(SEED)
        centers = (rng.standard_normal((NC, D), dtype=np.float32) * 2.5)
        a = rng.integers(0, NC, N)
        db = rng.standard_normal((N, D), dtype=np.float32)
        db += centers[a]
        np.save(cache_db, db)
        log(f"generate on host: {time.perf_counter()-t0:.1f}s")
    rng = np.random.default_rng(99)
    qa = rng.integers(0, N, B)
    q_np = (db[qa] + rng.standard_normal((B, D)).astype(np.float32) * 0.1)
    ds = DenseDataset(db)

    cfg = TreeXHybridConfig(
        num_partitions=N_PARTS, partitions_to_search=10,
        partition_training_sample_size=min(2_000_000, N),
        rerank_dtype="bfloat16",
        hash_config=AsymmetricHasherConfig(
            num_codes=16, num_subspaces=50, seed=42, max_iterations=12,
            training_sample_size=100_000))

    mesh = make_mesh(axis_names=("db",))
    log(f"mesh devices: {mesh.devices.size} ({jax.devices()[0].platform})")

    t0 = time.perf_counter()
    sharded = ShardedTreeXHybridSearcher.build(ds, cfg, mesh)
    t_sharded = time.perf_counter() - t0
    log(f"SHARDED build ({N_PARTS} partitions): {t_sharded:.1f}s")

    idx, _ = sharded.search_batched_arrays(
        q_np, K, SearchParameters(pre_reordering_num_neighbors=150))
    self_rec = float((idx[:, 0] == qa).mean())
    log(f"sharded-built index near-self recall@1: {self_rec:.4f}")

    t0 = time.perf_counter()
    path = "/tmp/sb5m_layout.npz"
    sharded.save_layout(path)
    log(f"save_layout: {time.perf_counter()-t0:.1f}s "
        f"({os.path.getsize(path)/2**30:.2f} GiB)")
    del sharded
    jax.clear_caches()

    t0 = time.perf_counter()
    warm = ShardedTreeXHybridSearcher.load_layout(path, mesh)
    idx2, _ = warm.search_batched_arrays(
        q_np[:8], K, SearchParameters(pre_reordering_num_neighbors=150))
    t_warm = time.perf_counter() - t0
    log(f"warm-start load_layout + first search: {t_warm:.1f}s")
    del warm
    jax.clear_caches()

    t0 = time.perf_counter()
    single = TreeXHybridSearcher(cfg).build(ds)
    t_single = time.perf_counter() - t0
    log(f"SINGLE-DEVICE build: {t_single:.1f}s "
        f"(sharded/single = {t_sharded/t_single:.2f}x)")
    idx3, _ = single.search_batched_arrays(
        q_np, K, SearchParameters(pre_reordering_num_neighbors=150))
    log(f"single-built index near-self recall@1: "
        f"{float((idx3[:, 0] == qa).mean()):.4f}")


if __name__ == "__main__":
    main()
