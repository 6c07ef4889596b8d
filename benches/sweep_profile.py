"""Sweep-dtype / block-r study at 1.18M x 100d on the real chip:
bf16 vs int8 streamed copy, r=32/64, B=128/1024, full-pipeline QPS
+ recall@10 vs exact GT on the timed queries."""

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu.data.dataset import DenseDataset
from scann_tpu.models.block_sweep import BlockSweepConfig, BlockSweepSearcher
from scann_tpu.models.brute_force import BruteForceSearcher
from scann_tpu.ops.distances import DistanceMeasure
from scann_tpu.ops.sweep_pallas import sweep_search_kernel
from scann_tpu.utils.benchmarking import recall_at_k, scan_time


def main():
    N, D = 1_180_000, 100
    key = jax.random.PRNGKey(42)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    NC = 5000
    centers = jax.random.normal(k1, (NC, D)) * 2.5
    a = jax.random.randint(k2, (N,), 0, NC)
    db_dev = jnp.take(centers, a, axis=0) + jax.random.normal(k3, (N, D))
    aq = jax.random.randint(k4, (1024,), 0, NC)
    q_all = jnp.take(centers, aq, axis=0) + jax.random.normal(k5, (1024, D))
    db = np.asarray(db_dev)
    q_np = np.asarray(q_all)
    ds = DenseDataset(db)
    gt, _ = BruteForceSearcher(ds).search_batched_arrays(q_np, 10)

    for sweep_dtype in ("bfloat16", "int8"):
        for r in (32, 64):
            cfg = BlockSweepConfig(sweep_dtype=sweep_dtype, block_r=r,
                                   pre_reorder_k=100)
            s = BlockSweepSearcher(ds, cfg)
            aug, rdb, norms, n_valid = s._device_state()
            for b in (128, 1024):
                q_dev = q_all[:b]
                idx, _ = s.search_batched_arrays(q_np[:b], 10)
                rec = recall_at_k(idx, gt[:b], 10)

                def mk(iters):
                    @jax.jit
                    def run(qq, augx, dbx, nx):
                        def body(acc, i):
                            vals, _ = sweep_search_kernel(
                                augx, dbx, nx, jnp.int32(n_valid),
                                qq + acc * 1e-20 + i * 1e-6,
                                pre_k=100, k=10, r=r,
                                measure=DistanceMeasure.SQUARED_L2,
                                inv_perm=s._inv_perm,
                                aug_scales=s._aug_scales, aug_sn=s._aug_sn)
                            return acc + jnp.where(jnp.isfinite(vals), vals,
                                                   0.0).sum(), None
                        acc, _ = jax.lax.scan(
                            body, jnp.float32(0),
                            jnp.arange(iters, dtype=jnp.float32))
                        return acc
                    return lambda: run(q_dev, aug, rdb, norms)

                dt = scan_time(mk, iters=8, rounds=3)
                print(f"{sweep_dtype} r={r} B={b}: recall@10={rec:.4f} "
                      f"{dt*1e3:.2f} ms/batch -> {b/dt:,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
