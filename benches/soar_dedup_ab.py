"""A/B: dedup-before-rerank-gather vs legacy pre_k×multiplicity inflation
on the adversarial 1.18M SOAR tree-AH (VERDICT r4 next #1).

Same-process comparison (tunnel QPS varies ~15-20% between sessions, so
only same-process A/Bs are controlled): ONE SOAR build, then the serving
kernel timed with spill_dedup=False (legacy: gather pre_k*mult rows, dedup
after the exact top-k) and spill_dedup=True (sort-based keep-best-per-id
over the approx slots, gather pre_k UNIQUE rows) at several pre_k — the
new path's pre_k counts unique candidates, so recall parity sits at a
somewhat larger pre_k and the win is read off the recall-matched rows.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/soar_dedup_ab.py
"""

import os
import time

import numpy as np

from scann_tpu.utils.benchmarking import chained, recall_at_k  # noqa: E402

N = int(os.environ.get("ADV_N", 1_180_000))
D, K, B = 100, 10, 1024
N_PARTS = int(os.environ.get("ADV_PARTS", 2000))
P = 30


def log(*a):
    print(*a, flush=True)


def main():
    import jax.numpy as jnp

    from scann_tpu.data.dataset import DenseDataset
    from scann_tpu.harness.ann_benchmark import generate_adversarial_dataset
    from scann_tpu.hashes.hasher import AsymmetricHasherConfig
    from scann_tpu.models.searcher import SearchParameters
    from scann_tpu.models.tree_x_hybrid import (
        TreeXHybridConfig,
        TreeXHybridSearcher,
        tree_ah_grouped_kernel,
    )
    from scann_tpu.ops.distances import DistanceMeasure

    t0 = time.perf_counter()
    data = generate_adversarial_dataset(N, B, D, K, seed=42)
    log(f"adversarial dataset + exact GT: {time.perf_counter()-t0:.1f}s")
    db, q_np, gt = data.train, data.test, data.gt
    ds = DenseDataset(db)

    t0 = time.perf_counter()
    cfg = TreeXHybridConfig(
        num_partitions=N_PARTS, partitions_to_search=P,
        spilling=True, spilling_mode="soar",
        hash_config=AsymmetricHasherConfig(
            num_codes=16, num_subspaces=50, seed=42, max_iterations=12,
            training_sample_size=100_000))
    s = TreeXHybridSearcher(cfg).build(ds)
    log(f"SOAR build: {time.perf_counter()-t0:.1f}s")

    db_d, norms, n_valid = s._device_state()
    _, codes_csr, csr_offsets, part_sizes, perm, l_cap = s._csr_state()
    cent = s.partitioner.centers_device()
    cb = s.codebook.centroids_device()
    mult = s.partitioner.tokenization.max_multiplicity
    assert s._use_grouped_pallas() and mult > 1
    q_dev = jnp.asarray(q_np[:B])
    q_cap = s.effective_q_cap(B, P)
    log(f"l_cap={l_cap} mult={mult} q_cap={q_cap} packed={s._pack_codes()}")

    for dedup, pre_k, qc in ((False, 300, None), (True, 300, None),
                             (True, 400, None), (False, 400, None),
                             (True, 300, 16)):
        kw = dict(p=P, pre_k=pre_k, k=K, l_cap=l_cap, use_residuals=True,
                  measure=DistanceMeasure.SQUARED_L2, multiplicity=mult,
                  approx_select_min=cfg.approx_selection_min_partitions,
                  l_tile=cfg.score_l_tile, packed=s._pack_codes(),
                  q_cap=qc or q_cap, spill_dedup=dedup)
        s.config.spill_dedup = dedup
        idx, _ = s.search_batched_arrays(
            q_np[:B], K, params=SearchParameters(
                num_leaves_to_search=P, pre_reordering_num_neighbors=pre_k))
        rec = recall_at_k(idx, gt[:B])

        def call(qq, dbx, nx, c, codes, off, sz, pm, cbx):
            return tree_ah_grouped_kernel(
                dbx, nx, c, codes, off, sz, pm, cbx, qq,
                jnp.int32(n_valid), None,
                jnp.float32(np.inf), jnp.float32(np.inf), **kw)

        dt = chained(lambda qq, *r: call(qq, *r),
                     (q_dev, db_d, norms, cent, codes_csr,
                      csr_offsets, part_sizes, perm, cb), iters=8)
        rows = pre_k if dedup else pre_k * mult
        log(f"dedup={dedup} pre_k={pre_k} q_cap={qc or q_cap} "
            f"(gather {rows} rows) B={B}: "
            f"recall@10={rec:.4f} {dt*1e3:.2f} ms/batch -> {B/dt:,.0f} QPS")


if __name__ == "__main__":
    main()
