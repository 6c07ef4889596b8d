"""10M-point single-chip crossover: bf16 block-min sweep vs tree-×-AH.

The tree-×-AH architecture's value proposition at production scale
(reference: src/tree_x_hybrid/mod.rs) is that its per-query cost is nearly
independent of N while an exact sweep streams the whole database per batch.
BENCH_NOTES' cost model put the B=1024 crossover at ~15-20M points with
measurement stopping at 5M; this script measures both architectures at
10M x 100d on one chip at matched recall and serving batch sizes.

Methodology identical to bench.py: chained on-device lax.scan timing (each
step's reduced output feeds the next step's input; one host sync at the
end), exact ground truth on the same queries that are timed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/crossover_10m.py
(~4 GB device->host pull for the dataset + a multi-minute index build; give
it an hour.)
"""

import os
import time

import numpy as np

# overridable for small-shape smoke tests (CROSSOVER_N=100000 ...)
N = int(os.environ.get("CROSSOVER_N", 10_000_000))
D, K = 100, 10
NC = max(N // 250, 8)  # ~250 points/cluster, same density as the 5M run
B = int(os.environ.get("CROSSOVER_B", 1024))
# ~625 points/partition, the 10M run's density (16k partitions at 10M)
N_PARTS = int(os.environ.get("CROSSOVER_PARTS", max(16_000, N // 625)))
SEED = 7
# CROSSOVER_SKIP_SWEEP=1 jumps straight to the tree (sweep already measured)
SKIP_SWEEP = os.environ.get("CROSSOVER_SKIP_SWEEP", "") == "1"
# 'bfloat16' halves the rerank copy: REQUIRED beyond ~15M on a 16 GB chip
# (f32 database alone is 8 GB at 20M x 100d; docs/DESIGN.md "HBM budget at
# scale"). The f32 build copy is dropped after the tree build.
RERANK_DTYPE = os.environ.get("CROSSOVER_RERANK_DTYPE", "float32")


def log(*a):
    print(*a, flush=True)


# ONE shared timing/recall implementation (scann_tpu/utils/benchmarking):
# methodology fixes reach bench.py and every benches/ script at once
from scann_tpu.utils.benchmarking import (  # noqa: E402,F401
    chained as _chained,
    pipelined,
    recall_at_k as _recall_at_k_shared,
    scan_time,
)


def recall_at_k(idx, gt, k=K):
    return _recall_at_k_shared(idx, gt, k)


def chained(kern_call, arrays, iters, rounds=3):
    return _chained(kern_call, arrays, iters, rounds, log=log)


def main():
    import jax
    import jax.numpy as jnp

    from scann_tpu import BruteForceSearcher, DenseDataset

    # generate on HOST: this environment's device<->host link runs at only
    # ~2.4 MB/s down / ~10 MB/s up, so a device-side generate + 4 GiB pull
    # costs ~30 min while host numpy draws 1e9 f32 normals in ~3 min. The
    # single 4 GiB upload happens once inside ds.device() and is then
    # shared by GT, the sweep and the tree build (device-cache reuse).
    t0 = time.perf_counter()
    cache_db = f"/tmp/crossover_{N}_{D}_{SEED}_db.npy"
    cache_q = f"/tmp/crossover_{N}_{D}_{SEED}_q{B}.npy"
    if os.path.exists(cache_db) and os.path.exists(cache_q):
        db = np.load(cache_db)
        q_np = np.load(cache_q)
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
        if N >= 1_000_000:
            np.save(cache_db, db)
            np.save(cache_q, q_np)
    ds = DenseDataset(db)

    t0 = time.perf_counter()
    jax.block_until_ready(ds.device()[0])
    log(f"upload to device: {time.perf_counter()-t0:.1f}s")

    # GT in 128-query chunks: a full [B, N] f32 distance matrix at B=1024,
    # N=10M would be 40 GiB — far past HBM. 128 queries -> 5 GiB temp.
    # Cached on disk: 13 min of device time per rerun at 10M.
    t0 = time.perf_counter()
    cache_gt = f"/tmp/crossover_{N}_{D}_{SEED}_gt{B}_k{K}.npy"
    if os.path.exists(cache_gt):
        gt = np.load(cache_gt)
        log(f"loaded cached GT: {time.perf_counter()-t0:.1f}s")
    else:
        bf = BruteForceSearcher(ds)
        # query-chunk so the [qc, N] f32 distance temp stays ~<=2.5 GB on
        # top of the f32 database (at 20M the db alone is 8 GB of HBM)
        qc = max(8, min(128, int(2.5e9 / (4 * N)) & ~7))
        gt_parts = []
        for i in range(0, B, qc):
            idx_c, _ = bf.search_batched_arrays(q_np[i : i + qc], K)
            gt_parts.append(idx_c)
        gt = np.concatenate(gt_parts, axis=0)
        if N >= 1_000_000:
            np.save(cache_gt, gt)
        log(f"exact GT over {B} queries: {time.perf_counter()-t0:.1f}s")

    from scann_tpu.ops.distances import DistanceMeasure

    if not SKIP_SWEEP:
        # ---------------- bf16 block-min sweep + exact re-rank --------------
        from scann_tpu.models.block_sweep import (
            BlockSweepConfig,
            BlockSweepSearcher,
        )
        from scann_tpu.ops.sweep_pallas import sweep_search_kernel

        t0 = time.perf_counter()
        # B=1024 at 20M OOMs the sweep program (block-minima + approx-top-k
        # sort temps scale with B: measured 17.44G > 15.75G); B=512 fits
        # and the sweep is stream-bound, so QPS is within ~10% of B=1024
        sweep_max_b = 512 if N >= 16_000_000 else 1024
        sweep = BlockSweepSearcher(
            ds, BlockSweepConfig(rerank_dtype=RERANK_DTYPE,
                                 max_batch=sweep_max_b))
        if RERANK_DTYPE != "float32":
            # the sweep serves from aug + the low-precision rerank copy
            # only; free the f32 database first (at 20M the padded f32
            # copy alone is 9.5 GB — with it resident the sweep program
            # measured 21.31G > the 15.75G HBM and cannot run)
            ds.drop_device_cache()
        aug, dbd, norms, n_valid = sweep._device_state()
        jax.block_until_ready(aug)
        log(f"block-sweep build (bf16 augmented + {RERANK_DTYPE} rerank "
            f"copy): {time.perf_counter()-t0:.1f}s")

        for b in sorted({min(32, B), min(B, sweep_max_b)}):
            q_dev = jnp.asarray(q_np[:b])
            idx, _ = sweep.search_batched_arrays(q_np[:b], K)
            rec = recall_at_k(idx, gt[:b])

            interp = jax.devices()[0].platform != "tpu"

            def call(qq, augx, dbx, nx):
                return sweep_search_kernel(augx, dbx, nx, jnp.int32(N), qq,
                                           pre_k=100, k=K,
                                           measure=DistanceMeasure.SQUARED_L2,
                                           interpret=interp)
            dt = chained(lambda qq, *r: call(qq, *r), (q_dev, aug, dbd, norms),
                         iters=8)
            log(f"sweep {N}x{D} pre_k=100 B={b}: recall@10={rec:.4f} "
                f"{dt*1e3:.2f} ms/batch -> {b/dt:,.0f} QPS")

        # free the bf16 augmented + rerank copies before the tree build
        del aug, dbd, norms, sweep
        jax.clear_caches()

    # ---------------------------- tree-×-AH -------------------------------
    from scann_tpu.hashes.hasher import AsymmetricHasherConfig
    from scann_tpu.models.searcher import SearchParameters
    from scann_tpu.models.tree_x_hybrid import (
        TreeXHybridConfig,
        TreeXHybridSearcher,
        tree_ah_grouped_kernel,
        tree_ah_kernel,
    )

    t0 = time.perf_counter()
    cfg = TreeXHybridConfig(
        num_partitions=N_PARTS, partitions_to_search=10,
        partition_training_sample_size=min(2_000_000, N),
        rerank_dtype=RERANK_DTYPE,
        hash_config=AsymmetricHasherConfig(
            num_codes=16, num_subspaces=50, seed=42, max_iterations=12,
            training_sample_size=100_000))
    s = TreeXHybridSearcher(cfg).build(ds)
    log(f"tree-AH build ({N_PARTS} partitions, rerank={RERANK_DTYPE}): "
        f"{time.perf_counter()-t0:.1f}s")

    if RERANK_DTYPE != "float32":
        # free the f32 build copy BEFORE the low-precision rerank copy
        # uploads (it builds from host numpy): the two copies must never
        # coexist — at 20M the padded f32 is 9.5 GB and bf16 is 4.8 GB,
        # together past the 15.75 GB chip
        ds.drop_device_cache()
        log("dropped f32 device copy before rerank-copy upload")
    db_d, norms, n_valid = s._device_state()
    rep = db_d[0] if isinstance(db_d, tuple) else db_d
    log(f"rerank copy dtype={rep.dtype}")
    codes_rows, codes_csr, csr_offsets, part_sizes, perm, l_cap = s._csr_state()
    cent = s.partitioner.centers_device()
    cb = s.codebook.centroids_device()
    grouped = s._use_grouped_pallas()
    log(f"l_cap={l_cap} kernel={'grouped-pallas' if grouped else 'xla'}")

    for p, pre_k in ((10, 150), (20, 200)):
        kw = dict(p=p, pre_k=pre_k, k=K, l_cap=l_cap, use_residuals=True,
                  measure=DistanceMeasure.SQUARED_L2, multiplicity=1,
                  approx_select_min=cfg.approx_selection_min_partitions)
        if grouped:
            kern, codes_arg = tree_ah_grouped_kernel, codes_csr
            kw.update(l_tile=cfg.score_l_tile, packed=s._pack_codes())
        else:
            kern, codes_arg = tree_ah_kernel, codes_rows
        for b in sorted({min(32, B), B}):
            q_dev = jnp.asarray(q_np[:b])
            idx, _ = s.search_batched_arrays(
                q_np[:b], K, params=SearchParameters(
                    num_leaves_to_search=p, pre_reordering_num_neighbors=pre_k))
            rec = recall_at_k(idx, gt[:b])
            if grouped:
                kw["q_cap"] = s.effective_q_cap(b, p)

            def call(qq, dbx, nx, c, codes, off, sz, pm, cbx):
                return kern(dbx, nx, c, codes, off, sz, pm, cbx, qq,
                            jnp.int32(n_valid), None,
                            jnp.float32(np.inf), jnp.float32(np.inf), **kw)
            dt = chained(lambda qq, *r: call(qq, *r),
                         (q_dev, db_d, norms, cent, codes_arg,
                          csr_offsets, part_sizes, perm, cb), iters=8)
            log(f"tree-AH {N}x{D} p={p} pre_k={pre_k} B={b}: "
                f"recall@10={rec:.4f} {dt*1e3:.2f} ms/batch -> {b/dt:,.0f} QPS")


if __name__ == "__main__":
    main()
