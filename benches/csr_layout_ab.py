"""A/B: id-embedded CSR rerank store vs the id-ordered store + perm gather.

The round-5 stage decomposition measured the [B, sel_k] perm-table scalar
gather at ~20 ns/element (~12 ms/batch at SOAR width B=1024, sel=600) —
the largest remaining serving cost after the one-hot row-resolution fix.
``rerank_layout="csr"`` (utils/reordering.build_csr_rerank_store) stores
the rerank rows in CSR order with the point id embedded in 4 base-256
digit lanes that the (8,128) lane tiling pads for free, so the row gather
takes the arithmetically-resolved positions directly and the perm gather
disappears. This script times both layouts over the SAME trained tree:

  - 1.18M clustered, mult=1 (the auto-default regime: identical bytes,
    identical results — pure gather-work delta)
  - optionally a SOAR build (CSR_AB_SOAR=1): mult=2, the store carries one
    row per assignment (x2 HBM) and dedup moves after the exact scores

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/csr_layout_ab.py
"""

import os
import time

import numpy as np

from scann_tpu.utils.benchmarking import chained, recall_at_k  # noqa: E402

N = int(os.environ.get("CSR_AB_N", 1_180_000))
D, K, B = 100, 10, 1024
N_PARTS = int(os.environ.get("CSR_AB_PARTS", 2000))
SOAR = os.environ.get("CSR_AB_SOAR", "") == "1"
RERANK = os.environ.get("CSR_AB_RERANK", "bfloat16")
CONFIGS = [tuple(map(int, c.split(":")))
           for c in os.environ.get("CSR_AB_CONFIGS", "").split(",") if c] \
    or ([(30, 300), (40, 400)] if SOAR else [(10, 150), (20, 200)])


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

    rng = np.random.default_rng(42)
    nc = N_PARTS
    centers = rng.standard_normal((nc, D), dtype=np.float32) * 2.5
    a = rng.integers(0, nc, N)
    db = rng.standard_normal((N, D), dtype=np.float32) + centers[a]
    aq = rng.integers(0, nc, B)
    q_np = centers[aq] + rng.standard_normal((B, D), dtype=np.float32)
    ds = DenseDataset(db)
    gt, _ = BruteForceSearcher(ds).search_batched_arrays(q_np, K)
    q_dev = jnp.asarray(q_np)

    t0 = time.perf_counter()
    cfg = TreeXHybridConfig(
        num_partitions=N_PARTS, partitions_to_search=10,
        spilling=SOAR, spilling_mode="soar" if SOAR else "distance",
        rerank_dtype=RERANK,
        hash_config=AsymmetricHasherConfig(
            num_codes=16, num_subspaces=50, seed=42, max_iterations=12,
            training_sample_size=100_000))
    s = TreeXHybridSearcher(cfg).build(ds)
    log(f"build N={N} parts={N_PARTS} soar={SOAR}: "
        f"{time.perf_counter()-t0:.1f}s")
    if RERANK != "float32":
        ds.drop_device_cache()

    _, codes_csr, offs, sizes, perm, l_cap = s._csr_state()
    cent = s.partitioner.centers_device()
    cb = s.codebook.centroids_device()
    mult = s.partitioner.tokenization.max_multiplicity
    assert s._use_grouped_pallas()

    for layout in ("id", "csr"):
        s.config.rerank_layout = layout
        if layout == "csr":
            s._lp_cache = None  # free the id store before the csr upload
            jax.clear_caches()
            t0 = time.perf_counter()
            store, n_valid = s._csr_store_state()
            jax.block_until_ready(store)
            log(f"csr store built ({store.shape}, {store.dtype}): "
                f"{time.perf_counter()-t0:.1f}s")
            db_d, norms = store, None
        else:
            db_d, norms, n_valid = s._device_state()
            jax.block_until_ready(
                db_d[0] if isinstance(db_d, tuple) else db_d)
        for p, pre_k in CONFIGS:
            idx, _ = s.search_batched_arrays(
                q_np, K, params=SearchParameters(
                    num_leaves_to_search=p,
                    pre_reordering_num_neighbors=pre_k))
            rec = recall_at_k(idx, gt)
            kw = dict(p=p, pre_k=pre_k, k=K, l_cap=l_cap,
                      use_residuals=True,
                      measure=DistanceMeasure.SQUARED_L2,
                      multiplicity=mult,
                      approx_select_min=cfg.approx_selection_min_partitions,
                      l_tile=cfg.score_l_tile, packed=s._pack_codes(),
                      q_cap=s.effective_q_cap(B, p),
                      csr_store=layout == "csr")

            def call(qq, dbx, nx, c, codes, off, sz, pm, cbx):
                return tree_ah_grouped_kernel(
                    dbx, nx, c, codes, off, sz, pm, cbx, qq,
                    jnp.int32(n_valid), None,
                    jnp.float32(np.inf), jnp.float32(np.inf), **kw)

            dt = chained(lambda qq, *r: call(qq, *r),
                         (q_dev, db_d, norms, cent, codes_csr, offs,
                          sizes, perm, cb), iters=8)
            log(f"{layout} layout p={p} pre_k={pre_k} B={B}: "
                f"recall@10={rec:.4f} {dt*1e3:.2f} ms/batch "
                f"-> {B/dt:,.0f} QPS")
        if layout == "csr":
            s._csr_store_cache = None
        jax.clear_caches()


if __name__ == "__main__":
    main()
