"""Shared benchmark timing/recall helpers — ONE implementation.

Used by bench.py (the driver artifact) and every script in benches/, so a
methodology fix reaches all published numbers at once. Two timing modes:

- :func:`scan_time` / :func:`chained` — device-resident loop via lax.scan:
  ``iters`` chained searches in ONE dispatch (per-dispatch tunnel latency
  amortized to ~0); each step's result feeds the next step's input and the
  returned scalar, so nothing can be elided. Best-of-rounds: noise only
  ever adds time.
- :func:`pipelined` — for shapes where the scan wrapper cannot compile
  (at 20M x 100d XLA rematerializes compressed+uncompressed copies of
  every multi-GB loop invariant inside the scan, measured +13.4G of HLO
  temps -> HBM OOM): ``iters`` DISTINCT pre-staged query batches (distinct
  inputs defeat identical-dispatch elision) dispatched back-to-back with
  one final block. Per-batch kernel time at that scale (>=25 ms) dwarfs
  the overlapped tunnel RTT.
"""

from __future__ import annotations

import time

import numpy as np

# arrays bigger than this skip the scan wrapper outright: the doomed
# compile attempt costs minutes through the remote compiler
CHAINED_BYTES_LIMIT = 6_000_000_000


def log(*a):  # overridable by importers
    print(*a, flush=True)


def scan_time(make_scan, iters, rounds=3):
    """Best per-iteration seconds of ``make_scan(iters)()`` over rounds."""
    fn = make_scan(iters)
    float(fn())  # compile + run once
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def chained(kern_call, arrays, iters, rounds=3, log=log):
    """Chained-scan timing of ``kern_call(q_perturbed, *arrays)`` ->
    (vals, idx); all big arrays ride as jit arguments. Falls back to
    :func:`pipelined` past CHAINED_BYTES_LIMIT or on compile failure."""
    import jax
    import jax.numpy as jnp

    def make_scan(it):
        @jax.jit
        def run(qq, *rest):
            def body(acc, i):
                vals, _ = kern_call(qq + acc * 1e-20 + i * 1e-6, *rest)
                return acc + jnp.where(jnp.isfinite(vals), vals, 0.0).sum(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(it, dtype=jnp.float32))
            return acc
        return lambda: run(*arrays)

    big = sum(getattr(a, "nbytes", 0)
              for t in arrays for a in (t if isinstance(t, tuple) else (t,)))
    if big > CHAINED_BYTES_LIMIT:
        log("pipelined dispatch timing (scan wrapper cannot fit at this "
            "scale; kernel time >> overlapped RTT)")
        return pipelined(kern_call, arrays, iters, rounds)
    try:
        return scan_time(make_scan, iters, rounds)
    except Exception as e:  # jax.errors.JaxRuntimeError: compile OOM
        log(f"chained-scan timing unavailable ({type(e).__name__}); "
            f"falling back to pipelined dispatch timing")
        return pipelined(kern_call, arrays, iters, rounds)


def pipelined(kern_call, arrays, iters, rounds=3):
    import jax
    import jax.numpy as jnp

    q0, rest = arrays[0], arrays[1:]
    qs = [jnp.asarray(q0 + np.float32(i + 1) * 1e-6) for i in range(iters)]
    jax.block_until_ready(qs)
    jax.block_until_ready(kern_call(qs[0], *rest))  # compile once
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [kern_call(q, *rest) for q in qs]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def recall_at_k(idx, gt, k=10):
    """Mean fraction of the k true neighbors present per row."""
    return float(np.mean([len(set(map(int, a[:k])) & set(map(int, g[:k]))) / k
                          for a, g in zip(idx, gt)]))
