"""1.18M-point pareto on GloVe-shaped adversarial synthetic data.

Re-publishes the flagship recall/QPS rows (bf16 block-min sweep + exact
re-rank, tree-×-AH grouped-MXU pipeline) on the harness's adversarial
generator — Zipf cluster mass, anisotropic covariance, correlated dims,
heavy-tailed norms — instead of the well-separated clustered generator
(VERDICT r2 weak #5: real GloVe is anisotropic with heavy-tailed cluster
sizes; partition balance is exactly what such data stresses). Reports the
partition-balance picture (sizes before/after the l_cap demote loop) along
with the timed rows.

Methodology identical to bench.py: chained on-device lax.scan timing, exact
GT on the same queries that are timed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/adversarial_1m.py
"""

import os
import time

import numpy as np

N = int(os.environ.get("ADV_N", 1_180_000))
D, K = 100, 10
B = int(os.environ.get("ADV_B", 1024))
N_PARTS = int(os.environ.get("ADV_PARTS", 2000))
SEED = 42
# ADV_SPILL=soar builds the tree with SOAR secondary assignments (2x codes)
SPILL = os.environ.get("ADV_SPILL", "")
# ADV_SKIP_SWEEP=1 jumps straight to the tree (sweep numbers already taken)
SKIP_SWEEP = os.environ.get("ADV_SKIP_SWEEP", "") == "1"
# ADV_RERANK sets the exact-rerank store dtype (bfloat16 for >=10M scale)
RERANK = os.environ.get("ADV_RERANK", "float32")
# ADV_CONFIGS="p:pre_k,p:pre_k" overrides the serving sweep
CONFIGS = [tuple(map(int, c.split(":")))
           for c in os.environ.get("ADV_CONFIGS", "").split(",") if c]     or [(10, 150), (20, 200), (30, 300)]
# ADV_B_ONLY=1 times only the large batch (the headline row)
B_ONLY = os.environ.get("ADV_B_ONLY", "") == "1"
# ADV_INDEX_CACHE=path.npz: reuse a previously built tree (the 10M SOAR
# build is ~22 min on-chip; serving studies shouldn't pay it twice)
INDEX_CACHE = os.environ.get("ADV_INDEX_CACHE", "")


def log(*a):
    print(*a, flush=True)


# ONE shared timing/recall implementation (scann_tpu/utils/benchmarking):
# methodology fixes reach bench.py and every benches/ script at once
from scann_tpu.utils.benchmarking import chained, recall_at_k, scan_time  # noqa: E402,F401


def main():
    import jax
    import jax.numpy as jnp

    from scann_tpu.data.dataset import DenseDataset
    from scann_tpu.harness.ann_benchmark import generate_adversarial_dataset

    t0 = time.perf_counter()
    data = generate_adversarial_dataset(N, B, D, K, seed=SEED)
    log(f"adversarial dataset + exact GT: {time.perf_counter()-t0:.1f}s")
    db, q_np, gt = data.train, data.test, data.gt
    norms_host = np.linalg.norm(db, axis=1)
    log(f"norm spread p50={np.median(norms_host):.2f} "
        f"p90={np.percentile(norms_host, 90):.2f} "
        f"p99={np.percentile(norms_host, 99):.2f} max={norms_host.max():.2f}")
    ds = DenseDataset(db)

    from scann_tpu.ops.distances import DistanceMeasure

    if not SKIP_SWEEP:
        # ---------------- bf16 block-min sweep + exact re-rank --------------
        from scann_tpu.models.block_sweep import BlockSweepSearcher
        from scann_tpu.ops.sweep_pallas import sweep_search_kernel

        t0 = time.perf_counter()
        sweep = BlockSweepSearcher(ds)
        aug, dbd, norms, n_valid = sweep._device_state()
        jax.block_until_ready(aug)
        log(f"block-sweep build: {time.perf_counter()-t0:.1f}s")

        for b in (128, B):
            q_dev = jnp.asarray(q_np[:b])
            idx, _ = sweep.search_batched_arrays(q_np[:b], K)
            rec = recall_at_k(idx, gt[:b])

            def call(qq, augx, dbx, nx):
                return sweep_search_kernel(augx, dbx, nx, jnp.int32(N), qq,
                                           pre_k=100, k=K,
                                           measure=DistanceMeasure.SQUARED_L2)
            dt = chained(lambda qq, *r: call(qq, *r), (q_dev, aug, dbd, norms),
                         iters=12)
            log(f"ADV sweep {N}x{D} pre_k=100 B={b}: recall@10={rec:.4f} "
                f"{dt*1e3:.2f} ms/batch -> {b/dt:,.0f} QPS")

        del aug, sweep
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
        spilling=SPILL == "soar", spilling_mode=SPILL or "distance",
        rerank_dtype=RERANK,
        hash_config=AsymmetricHasherConfig(
            num_codes=16, num_subspaces=50, seed=42, max_iterations=12,
            training_sample_size=100_000))
    if INDEX_CACHE and os.path.exists(INDEX_CACHE):
        from scann_tpu.io import load_index

        s = load_index(INDEX_CACHE)
        s.config.rerank_dtype = RERANK
        log(f"loaded cached index: {time.perf_counter()-t0:.1f}s")
    else:
        s = TreeXHybridSearcher(cfg).build(ds)
        log(f"tree-AH build ({N_PARTS} partitions, spill={SPILL or 'none'}): "
            f"{time.perf_counter()-t0:.1f}s")
        if INDEX_CACHE:
            from scann_tpu.io import save_index

            save_index(INDEX_CACHE, s)
            log(f"index cached -> {INDEX_CACHE}")

    # partition-balance picture on skewed data: the l_cap demote loop is the
    # lever this generator stresses
    tk = s.partitioner.tokenization
    sizes = np.asarray(tk.partition_sizes)
    log(f"partition sizes after balance: mean={sizes.mean():.0f} "
        f"p50={np.median(sizes):.0f} p99={np.percentile(sizes, 99):.0f} "
        f"max={sizes.max()} (cap target 1.5x mean)")

    if RERANK != "float32":
        # free the build-time f32 device cache BEFORE the low-precision
        # store uploads, so the two copies never coexist in HBM
        ds.drop_device_cache()
    db_d, norms, n_valid = s._device_state()
    codes_rows, codes_csr, csr_offsets, part_sizes, perm, l_cap = s._csr_state()
    cent = s.partitioner.centers_device()
    cb = s.codebook.centroids_device()
    grouped = s._use_grouped_pallas()
    # SOAR builds assign points to up to 2 partitions: the timing kernel must
    # run with the same dedup multiplicity the searcher serves with
    mult = s.partitioner.tokenization.max_multiplicity
    log(f"l_cap={l_cap} multiplicity={mult} "
        f"kernel={'grouped-pallas' if grouped else 'xla'}")

    for p, pre_k in CONFIGS:
        kw = dict(p=p, pre_k=pre_k, k=K, l_cap=l_cap, use_residuals=True,
                  measure=DistanceMeasure.SQUARED_L2, multiplicity=mult,
                  approx_select_min=cfg.approx_selection_min_partitions)
        if grouped:
            kern, codes_arg = tree_ah_grouped_kernel, codes_csr
            kw.update(l_tile=cfg.score_l_tile, packed=s._pack_codes())
        else:
            kern, codes_arg = tree_ah_kernel, codes_rows
        for b in ((B,) if B_ONLY else (128, B)):
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
            log(f"ADV tree-AH {N}x{D} p={p} pre_k={pre_k} B={b}: "
                f"recall@10={rec:.4f} {dt*1e3:.2f} ms/batch -> {b/dt:,.0f} QPS")


if __name__ == "__main__":
    main()
