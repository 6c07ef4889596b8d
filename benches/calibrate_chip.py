"""Chip-profile calibration on real hardware + dispatch-bias
quantification (VERDICT r4 next #7 / weak #5).

Runs `chip_profile.calibrate()` (per-call wall-clock through the public
API — the deployment-cheap method) and then re-times the SAME two probe
searchers with the chained on-device lax.scan protocol, so the
wall-clock ratio's dispatch contamination is QUANTIFIED: both
`sweep_max_n` estimates are printed side by side. The saved profile uses
the chained ratio when the two disagree materially.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/calibrate_chip.py
"""

import time

import numpy as np

N_PROBE, D, B, K = 200_000, 100, 256, 10


def log(*a):
    print(*a, flush=True)


def main():
    import jax.numpy as jnp

    from scann_tpu.data.dataset import DenseDataset
    from scann_tpu.hashes.hasher import AsymmetricHasherConfig
    from scann_tpu.models.block_sweep import BlockSweepConfig, BlockSweepSearcher
    from scann_tpu.models.tree_x_hybrid import (
        TreeXHybridConfig,
        TreeXHybridSearcher,
        tree_ah_grouped_kernel,
    )
    from scann_tpu.ops.distances import DistanceMeasure
    from scann_tpu.ops.sweep_pallas import sweep_search_kernel
    from scann_tpu.utils import chip_profile
    from scann_tpu.utils.benchmarking import chained

    t0 = time.perf_counter()
    prof = chip_profile.calibrate(n_probe=N_PROBE, dim=D, batch=B,
                                  verbose=True)
    log(f"calibrate() wall-clock method: {time.perf_counter()-t0:.1f}s -> "
        f"sweep_max_n={prof.sweep_max_n:,} "
        f"f32_rerank_max_bytes={prof.f32_rerank_max_bytes/2**30:.2f} GiB")

    # chained re-measurement of the same two probes (no dispatch in the
    # timed region): the ratio difference IS the contamination
    rng = np.random.default_rng(0)
    db = rng.standard_normal((N_PROBE, D), dtype=np.float32)
    q = rng.standard_normal((B, D), dtype=np.float32)
    ds = DenseDataset(db)
    q_dev = jnp.asarray(q)

    sweep = BlockSweepSearcher(ds, BlockSweepConfig(block_r=64,
                                                    pre_reorder_k=64))
    aug, dbd, norms, n_valid = sweep._device_state()

    def sweep_call(qq, augx, dbx, nx):
        return sweep_search_kernel(augx, dbx, nx, jnp.int32(N_PROBE), qq,
                                   pre_k=64, k=K,
                                   measure=DistanceMeasure.SQUARED_L2)

    t_sweep = chained(lambda qq, *r: sweep_call(qq, *r),
                      (q_dev, aug, dbd, norms), iters=12)

    parts = max(N_PROBE // 600, 16)
    subs = min((s for s in range(1, D + 1) if D % s == 0),
               key=lambda s: (abs(D / s - 2), -s))
    tree = TreeXHybridSearcher(TreeXHybridConfig(
        num_partitions=parts, partitions_to_search=10,
        hash_config=AsymmetricHasherConfig(
            num_codes=16, num_subspaces=subs, seed=0,
            max_iterations=8))).build(ds)
    db_d, tnorms, n_v = tree._device_state()
    _, codes_csr, offs, sizes, perm, l_cap = tree._csr_state()
    kw = dict(p=10, pre_k=30, k=K, l_cap=l_cap, use_residuals=True,
              measure=DistanceMeasure.SQUARED_L2, multiplicity=1,
              approx_select_min=1024, l_tile=tree.config.score_l_tile,
              packed=tree._pack_codes(), q_cap=tree.effective_q_cap(B, 10))

    def tree_call(qq, dbx, nx, c, codes, off, sz, pm, cbx):
        return tree_ah_grouped_kernel(
            dbx, nx, c, codes, off, sz, pm, cbx, qq, jnp.int32(n_v), None,
            jnp.float32(np.inf), jnp.float32(np.inf), **kw)

    t_tree = chained(lambda qq, *r: tree_call(qq, *r),
                     (q_dev, db_d, tnorms, tree.partitioner.centers_device(),
                      codes_csr, offs, sizes, perm,
                      tree.codebook.centroids_device()), iters=12)

    n_cross = int(N_PROBE * max(t_tree / max(t_sweep, 1e-9), 1.0))
    log(f"chained method: t_sweep={t_sweep*1e3:.2f}ms "
        f"t_tree={t_tree*1e3:.2f}ms -> sweep_max_n={n_cross:,}")
    log(f"dispatch bias on sweep_max_n: wall {prof.sweep_max_n:,} vs "
        f"chained {n_cross:,} "
        f"({prof.sweep_max_n / max(n_cross, 1):.2f}x)")

    prof.sweep_max_n = n_cross
    prof.source += f"; chained-corrected n_cross={n_cross}"
    chip_profile.save_profile(prof, "/tmp/chip_profile_calibrated.json")
    log("saved /tmp/chip_profile_calibrated.json")


if __name__ == "__main__":
    main()
