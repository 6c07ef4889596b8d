"""20M rerun: residual-anchored int8 rerank vs bf16 (VERDICT r4 next #2).

Round 4 measured int8 rerank (global-affine ScalarQuantizer codec) at
−3.5pp recall@10 vs bf16 at 20M — cluster spread ate the 256 levels. The
codec is now residual-anchored per-dim (utils/reordering.
residual_rerank_codec: quantize row − center[token]); this script builds
the 20M tree ONCE (same generator/seed/partitions as the round-3/4 rows)
and evaluates BOTH rerank stores over the identical artifacts, so any
recall difference is the codec's alone. Done-criterion: int8 within
~0.5pp of bf16 at unchanged bytes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/rerank20m_int8.py
(give it ~90 min: 8 GiB host generate + upload + GT + 2,700 s build).
"""

import os
import time

import numpy as np

from scann_tpu.utils.benchmarking import chained, recall_at_k  # noqa: E402

N = int(os.environ.get("R20_N", 20_000_000))
D, K, B = 100, 10, 1024
NC = max(N // 250, 8)
N_PARTS = int(os.environ.get("R20_PARTS", max(16_000, N // 625)))
SEED = 7  # crossover_10m's seed: same dataset as the round-3/4 20M rows


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from scann_tpu import BruteForceSearcher, DenseDataset
    from scann_tpu.hashes.hasher import AsymmetricHasherConfig
    from scann_tpu.models.searcher import SearchParameters
    from scann_tpu.models.tree_x_hybrid import (
        TreeXHybridConfig,
        TreeXHybridSearcher,
        tree_ah_grouped_kernel,
    )
    from scann_tpu.ops.distances import DistanceMeasure

    t0 = time.perf_counter()
    cache_db = f"/tmp/crossover_{N}_{D}_{SEED}_db.npy"
    cache_q = f"/tmp/crossover_{N}_{D}_{SEED}_q{B}.npy"
    if os.path.exists(cache_db):
        db, q_np = np.load(cache_db), np.load(cache_q)
        log(f"loaded cached dataset: {time.perf_counter()-t0:.1f}s")
    else:
        rng = np.random.default_rng(SEED)
        centers = (rng.standard_normal((NC, D), dtype=np.float32) * 2.5)
        a = rng.integers(0, NC, N)
        db = rng.standard_normal((N, D), dtype=np.float32)
        db += centers[a]
        aq = rng.integers(0, NC, B)
        q_np = (centers[aq]
                + rng.standard_normal((B, D), dtype=np.float32)).astype(np.float32)
        log(f"generate on host ({db.nbytes/2**30:.1f} GiB): "
            f"{time.perf_counter()-t0:.1f}s")
        np.save(cache_db, db)
        np.save(cache_q, q_np)
    ds = DenseDataset(db)

    t0 = time.perf_counter()
    cache_gt = f"/tmp/crossover_{N}_{D}_{SEED}_gt{B}_k{K}.npy"
    if os.path.exists(cache_gt):
        gt = np.load(cache_gt)
        log(f"loaded cached GT: {time.perf_counter()-t0:.1f}s")
    else:
        bf = BruteForceSearcher(ds)
        qc = max(8, min(128, int(2.5e9 / (4 * N)) & ~7))
        gt = np.concatenate([
            bf.search_batched_arrays(q_np[i : i + qc], K)[0]
            for i in range(0, B, qc)], axis=0)
        np.save(cache_gt, gt)
        log(f"exact GT over {B} queries: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    cfg = TreeXHybridConfig(
        num_partitions=N_PARTS, partitions_to_search=10,
        partition_training_sample_size=min(2_000_000, N),
        rerank_dtype="bfloat16",
        hash_config=AsymmetricHasherConfig(
            num_codes=16, num_subspaces=50, seed=42, max_iterations=12,
            training_sample_size=100_000))
    s = TreeXHybridSearcher(cfg).build(ds)
    log(f"tree-AH build ({N_PARTS} partitions): "
        f"{time.perf_counter()-t0:.1f}s")
    # this A/B isolates the rerank CODEC; pin the id layout so the public
    # API's recall eval and the timed kernel use the same single store
    # (the csr-layout default would otherwise build a second 5.4 GB copy)
    s.config.rerank_layout = "id"
    ds.drop_device_cache()
    log("dropped f32 device copy")

    _, codes_csr, csr_offsets, part_sizes, perm, l_cap = s._csr_state()
    cent = s.partitioner.centers_device()
    cb = s.codebook.centroids_device()
    assert s._use_grouped_pallas()

    for rdt in ("bfloat16", "int8"):
        # swap the rerank store over the SAME trained artifacts
        s.config.rerank_dtype = rdt
        s._lp_cache = None
        t0 = time.perf_counter()
        db_d, norms, n_valid = s._device_state()
        jax.block_until_ready(norms)
        codec = ("residual-anchored per-dim" if isinstance(db_d, tuple)
                 and len(db_d) == 5 else rdt)
        log(f"rerank store {rdt} ({codec}) built: "
            f"{time.perf_counter()-t0:.1f}s")
        for p, pre_k in ((10, 150), (20, 200)):
            kw = dict(p=p, pre_k=pre_k, k=K, l_cap=l_cap,
                      use_residuals=True,
                      measure=DistanceMeasure.SQUARED_L2, multiplicity=1,
                      approx_select_min=cfg.approx_selection_min_partitions,
                      l_tile=cfg.score_l_tile, packed=s._pack_codes(),
                      q_cap=s.effective_q_cap(B, p))
            idx, _ = s.search_batched_arrays(
                q_np[:B], K, params=SearchParameters(
                    num_leaves_to_search=p,
                    pre_reordering_num_neighbors=pre_k))
            rec = recall_at_k(idx, gt[:B])
            q_dev = jnp.asarray(q_np[:B])

            def call(qq, dbx, nx, c, codes, off, sz, pm, cbx):
                return tree_ah_grouped_kernel(
                    dbx, nx, c, codes, off, sz, pm, cbx, qq,
                    jnp.int32(n_valid), None,
                    jnp.float32(np.inf), jnp.float32(np.inf), **kw)

            dt = chained(lambda qq, *r: call(qq, *r),
                         (q_dev, db_d, norms, cent, codes_csr,
                          csr_offsets, part_sizes, perm, cb), iters=8)
            log(f"{rdt} tree-AH {N}x{D} p={p} pre_k={pre_k} B={B}: "
                f"recall@10={rec:.4f} {dt*1e3:.2f} ms/batch "
                f"-> {B/dt:,.0f} QPS")
        # free this store before the next uploads
        s._lp_cache = None
        jax.clear_caches()


if __name__ == "__main__":
    main()
