"""Chip-profile calibration on real hardware (VERDICT r4 next #7 / weak #5).

Runs `chip_profile.calibrate()` — now the chained two-point method — and
saves the resulting profile. History of the methodology (measured this
round, BENCH_NOTES "Chip calibration on hardware"):

  1. per-call wall clock through this environment's dispatch-RTT-bound
     tunnel measured t_sweep=56.89 ms vs t_tree=54.11 ms at a 200k probe —
     pure overhead (the chained kernel times were 2.49/2.81 ms), ratio
     useless;
  2. a chained ONE-point ratio extrapolated a ~226k crossover (measured
     truth: 10-15M) because at small N the fixed select/top-k/rerank cost
     dominates both pipelines;
  3. the shipped method times the sweep at TWO probe sizes, fits
     t(N) = a + b*N, and intersects the tree's ~flat chained time with the
     sweep's slope — the only term that actually scales with N.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/calibrate_chip.py
"""

import time

OUT = "/tmp/chip_profile_calibrated.json"


def main():
    from scann_tpu.utils import chip_profile

    t0 = time.perf_counter()
    prof = chip_profile.calibrate(verbose=True)
    print(f"calibrate() total: {time.perf_counter()-t0:.1f}s")
    print(f"sweep_max_n={prof.sweep_max_n:,} "
          f"f32_rerank_max_bytes={prof.f32_rerank_max_bytes/2**30:.2f} GiB")
    print(f"source: {prof.source}")
    chip_profile.save_profile(prof, OUT)
    print(f"saved {OUT} (use SCANN_TPU_CHIP_PROFILE={OUT} or the harness's "
          "--calibrate-profile to serve with it)")


if __name__ == "__main__":
    main()
