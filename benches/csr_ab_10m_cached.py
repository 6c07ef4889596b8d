"""CSR-embedded rerank layout A/B on the cached 10M adversarial SOAR index.

Loads the index built by the round-5 10M sweep (benches/adversarial_1m.py
with ADV_INDEX_CACHE), serves the same configs through BOTH rerank
layouts, and also cross-checks that the two layouts return identical
neighbor ids through the public API (the end-to-end verification for the
layout change on real TPU).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python -u benches/csr_ab_10m_cached.py
"""

import os
import time

import numpy as np

from scann_tpu.utils.benchmarking import chained  # noqa: E402

CACHE = os.environ.get("CSR10_CACHE", "/tmp/adv10m_soar.npz")
CONFIGS = [tuple(map(int, c.split(":")))
           for c in os.environ.get("CSR10_CONFIGS", "").split(",") if c] \
    or [(60, 400), (240, 800)]
B, K = 1024, 10


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from scann_tpu.io import load_index
    from scann_tpu.models.searcher import SearchParameters
    from scann_tpu.models.tree_x_hybrid import tree_ah_grouped_kernel
    from scann_tpu.ops.distances import DistanceMeasure

    t0 = time.perf_counter()
    s = load_index(CACHE)
    s.config.rerank_dtype = "bfloat16"
    log(f"loaded cached 10M index: {time.perf_counter()-t0:.1f}s")
    mult = s.partitioner.tokenization.max_multiplicity
    rng = np.random.default_rng(123)
    data = s._dataset.numpy()
    qa = rng.integers(0, len(data), B)
    q_np = (data[qa] + rng.standard_normal((B, data.shape[1]))
            .astype(np.float32) * 0.05)
    q_dev = jnp.asarray(q_np)

    _, codes_csr, offs, sizes, perm, l_cap = s._csr_state()
    cent = s.partitioner.centers_device()
    cb = s.codebook.centroids_device()
    assert s._use_grouped_pallas() and mult == 2

    results = {}
    for layout in ("id", "csr"):
        s.config.rerank_layout = layout
        if layout == "csr":
            s._lp_cache = None
            jax.clear_caches()
            t0 = time.perf_counter()
            db_d, n_valid = s._csr_store_state()
            jax.block_until_ready(db_d)
            log(f"csr store ({db_d.shape} {db_d.dtype}, "
                f"{db_d.size * db_d.dtype.itemsize/2**30:.2f} GiB logical): "
                f"{time.perf_counter()-t0:.1f}s")
            norms = None
        else:
            db_d, norms, n_valid = s._device_state()

        # end-to-end answers through the public API (near-self queries):
        idx, _ = s.search_batched_arrays(
            q_np[:256], K, params=SearchParameters(
                num_leaves_to_search=60,
                pre_reordering_num_neighbors=400))
        results[layout] = idx
        self1 = float((idx[:, 0] == qa[:256]).mean())
        log(f"{layout}: near-self recall@1 = {self1:.4f}")

        for p, pre_k in CONFIGS:
            kw = dict(p=p, pre_k=pre_k, k=K, l_cap=l_cap,
                      use_residuals=True,
                      measure=DistanceMeasure.SQUARED_L2,
                      multiplicity=mult,
                      approx_select_min=(
                          s.config.approx_selection_min_partitions),
                      l_tile=s.config.score_l_tile, packed=s._pack_codes(),
                      q_cap=s.effective_q_cap(B, p),
                      csr_store=layout == "csr")

            def call(qq, dbx, nx, c, codes, off, sz, pm, cbx):
                return tree_ah_grouped_kernel(
                    dbx, nx, c, codes, off, sz, pm, cbx, qq,
                    jnp.int32(n_valid), None,
                    jnp.float32(np.inf), jnp.float32(np.inf), **kw)

            dt = chained(lambda qq, *r: call(qq, *r),
                         (q_dev, db_d, norms, cent, codes_csr, offs,
                          sizes, perm, cb), iters=6)
            log(f"{layout} layout p={p} pre_k={pre_k} B={B}: "
                f"{dt*1e3:.2f} ms/batch -> {B/dt:,.0f} QPS")
        jax.clear_caches()

    same = float((results["id"] == results["csr"]).mean())
    log(f"id-vs-csr neighbor agreement (256 q, k={K}): {same:.4f}")
    # under SOAR the layouts rerank DIFFERENT candidate pools by design
    # (id: dedup-before truncates to pre_k uniques; csr: dedup-after keeps
    # every slot) so a ~2% tail disagreement at k=10 is expected — exact
    # identity at mult=1 / deep pre_k is pinned by the CPU parity tests
    # (tests/test_tree_x_hybrid.py csr_rerank suite); measured here:
    # 0.9793 agreement with near-self recall@1 = 1.0 on BOTH layouts
    assert same > 0.95, "layouts disagree beyond dedup-order effects"
    log("VERIFY OK")


if __name__ == "__main__":
    main()
