"""q_cap density study, round 5 (VERDICT r4 next #8 + re-derivation).

The round-4 adaptive rule (q_cap=16 when B*p/num_partitions >= 12) was
derived from two points measured on the PRE-round-5 kernels. The round-5
serving fixes (one-hot row resolution, norm recompute) changed the cost
balance, and the post-fix SOAR A/B measured q_cap=16 winning at density
8.4 — below the old threshold. This script measures q_cap ∈ {8, 16, 32}
at three shapes in one process (within-table ordering is the signal):

  - 200k flagship (p=10, parts=1000, l_cap~1024): density 10.2
  - 1.18M clustered tree (p=10, parts=2000, l_cap~1024): density 5.1
  - 1.18M clustered tree (p=30): density 15.4

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/qcap_study.py
"""

import time

import numpy as np

from scann_tpu.utils.benchmarking import chained, recall_at_k  # noqa

D, K, B = 100, 10, 1024


def log(*a):
    print(*a, flush=True)


def bench_tree(s, cfg, q_dev, configs):
    import jax.numpy as jnp

    from scann_tpu.models.tree_x_hybrid import tree_ah_grouped_kernel
    from scann_tpu.ops.distances import DistanceMeasure

    db_d, norms, n_valid = s._device_state()
    _, codes_csr, offs, sizes, perm, l_cap = s._csr_state()
    cent = s.partitioner.centers_device()
    cb = s.codebook.centroids_device()
    kp = s.partitioner.num_partitions
    for p, pre_k, q_cap in configs:
        kw = dict(p=p, pre_k=pre_k, k=K, l_cap=l_cap, use_residuals=True,
                  measure=DistanceMeasure.SQUARED_L2,
                  multiplicity=s.partitioner.tokenization.max_multiplicity,
                  approx_select_min=cfg.approx_selection_min_partitions,
                  l_tile=cfg.score_l_tile, packed=s._pack_codes(),
                  q_cap=q_cap)

        def call(qq, dbx, nx, c, codes, off_, sz, pm, cbx):
            return tree_ah_grouped_kernel(
                dbx, nx, c, codes, off_, sz, pm, cbx, qq,
                jnp.int32(n_valid), None,
                jnp.float32(np.inf), jnp.float32(np.inf), **kw)

        dt = chained(lambda qq, *r: call(qq, *r),
                     (q_dev, db_d, norms, cent, codes_csr, offs, sizes,
                      perm, cb), iters=8)
        dens = B * p / kp
        log(f"N={s.dataset_size()} p={p} pre_k={pre_k} l_cap={l_cap} "
            f"density={dens:.1f} q_cap={q_cap}: "
            f"{dt*1e3:.2f} ms/batch -> {B/dt:,.0f} QPS")


def main():
    import jax
    import jax.numpy as jnp

    from scann_tpu.data.dataset import DenseDataset
    from scann_tpu.hashes.hasher import AsymmetricHasherConfig
    from scann_tpu.models.tree_x_hybrid import (
        TreeXHybridConfig,
        TreeXHybridSearcher,
    )

    rng = np.random.default_rng(42)

    for n, parts, configs in (
        (200_000, 1000, [(10, 100, 8), (10, 100, 16), (10, 100, 32)]),
        (1_180_000, 2000,
         [(10, 150, 8), (10, 150, 16),
          (30, 300, 8), (30, 300, 16), (30, 300, 32)]),
    ):
        nc = parts
        centers = rng.standard_normal((nc, D), dtype=np.float32) * 2.5
        a = rng.integers(0, nc, n)
        db = rng.standard_normal((n, D), dtype=np.float32) + centers[a]
        aq = rng.integers(0, nc, B)
        q = (centers[aq]
             + rng.standard_normal((B, D), dtype=np.float32))
        ds = DenseDataset(db)
        t0 = time.perf_counter()
        cfg = TreeXHybridConfig(
            num_partitions=parts, partitions_to_search=10,
            hash_config=AsymmetricHasherConfig(
                num_codes=16, num_subspaces=50, seed=42, max_iterations=12,
                training_sample_size=100_000))
        s = TreeXHybridSearcher(cfg).build(ds)
        log(f"build N={n} parts={parts} "
            f"(grown {s.partitioner.num_partitions}): "
            f"{time.perf_counter()-t0:.1f}s")
        bench_tree(s, cfg, jnp.asarray(q), configs)
        del s, ds
        jax.clear_caches()


if __name__ == "__main__":
    main()
