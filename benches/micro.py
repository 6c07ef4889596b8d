"""Micro-benchmark suite mirroring the reference's criterion groups
(reference: benches/scann_benchmark.rs:545-560 — brute force by n, distance
measures, kmeans by k, batched search, SIMD ops by dim, LUT16 by subspaces,
int8 asymmetric, scalar-quantized vs float, many-to-many, mutator, top-k).

All device benchmarks use the sound on-device scan methodology (see
bench.py). Run: PYTHONPATH=. python benches/micro.py [group ...]
"""

import sys
import time

import numpy as np


def scan_time(make_run, iters=30, rounds=3):
    import jax

    fn = make_run(iters)
    float(fn())
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _scanned(body, x0, *args, iters=30):
    """Wrap body(x, *args)->scalar into a chained on-device scan."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, *a):
        def step(acc, i):
            return acc + body(x + acc * 1e-20 + i * 1e-6, *a), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(iters, dtype=jnp.float32))
        return acc
    return lambda: run(x0, *args)


def bench_brute_force():
    import jax, jax.numpy as jnp
    from scann_tpu.ops.distances import DistanceMeasure, many_to_many
    from scann_tpu.ops.topk import top_k_smallest

    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (100, 64))
    for n in (1_000, 10_000, 100_000):
        db = jax.random.uniform(key, (n, 64))
        norms = jnp.sum(db * db, axis=1)

        def body(qq, dbx, nx):
            d = many_to_many(DistanceMeasure.SQUARED_L2, qq, dbx, nx)
            return top_k_smallest(d, 10)[0].sum()

        dt = scan_time(lambda it: _scanned(body, q, db, norms, iters=it))
        print(f"brute_force/search_k10/{n}: {dt*1e3:8.3f} ms/100q -> {100/dt:,.0f} QPS")


def bench_distances():
    import jax, jax.numpy as jnp
    from scann_tpu.ops.distances import DistanceMeasure, many_to_many

    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (100, 128))
    db = jax.random.uniform(key, (10_000, 128))
    for m in (DistanceMeasure.SQUARED_L2, DistanceMeasure.DOT_PRODUCT,
              DistanceMeasure.COSINE, DistanceMeasure.L1):
        def body(qq, dbx, mm=m):
            return many_to_many(mm, qq, dbx).sum()
        dt = scan_time(lambda it: _scanned(body, q, db, iters=it), iters=10)
        print(f"distances/{m.value}/10000x128: {dt*1e3:8.3f} ms")


def bench_kmeans():
    import jax, jax.numpy as jnp
    from scann_tpu.trees.kmeans import _lloyd_step

    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (100_000, 64))
    for k in (16, 100, 1000):
        centers = data[:k]

        def body(d, c, kk=k):
            nc, inertia = _lloyd_step(d, c, k=kk)
            return inertia

        dt = scan_time(lambda it: _scanned(body, data, centers, iters=it), iters=5)
        print(f"kmeans/lloyd_iter/k={k}: {dt*1e3:8.2f} ms (100k x 64d)")


def bench_lut16():
    import jax, jax.numpy as jnp
    from scann_tpu.ops.pallas_kernels import lut16_score_auto

    key = jax.random.PRNGKey(0)
    for s in (8, 16, 64):
        codes = jax.random.randint(key, (s, 65536), 0, 16, dtype=jnp.int32).astype(jnp.uint8)
        luts = jax.random.uniform(key, (128, s, 16))

        def body(l, c):
            return lut16_score_auto(l, c).sum()

        dt = scan_time(lambda it: _scanned(body, luts, codes, iters=it), iters=10)
        print(f"lut16/batch/{s}subspaces/64k pts: {dt*1e3:8.3f} ms "
              f"-> {128*65536/dt/1e9:6.1f} G point-scores/s")


def bench_int8():
    import jax, jax.numpy as jnp
    from scann_tpu.ops.pallas_kernels import int8_dots_auto

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (128, 128))
    codes_t = jax.random.randint(key, (128, 1_048_576), 0, 256,
                                 dtype=jnp.int32).astype(jnp.uint8)

    def body(qq, c):
        return int8_dots_auto(qq, c).sum()

    dt = scan_time(lambda it: _scanned(body, q, codes_t, iters=it), iters=10)
    print(f"int8_asymmetric/1M x 128d: {dt*1e3:8.3f} ms "
          f"-> {1_048_576*128/dt/1e9:6.1f} G point-dots/s")


def bench_topk():
    import jax, jax.numpy as jnp
    from scann_tpu.ops.topk import approx_top_k_smallest, top_k_smallest

    key = jax.random.PRNGKey(0)
    d = jax.random.uniform(key, (128, 1_048_576))
    for name, fn in (("exact_two_stage_k10", lambda x: top_k_smallest(x, 10)[0]),
                     ("approx_k300", lambda x: approx_top_k_smallest(x, 300)[0])):
        def body(x, f=fn):
            return f(x).sum()
        dt = scan_time(lambda it: _scanned(body, d, iters=it), iters=10)
        print(f"topk/{name}/[128,1M]: {dt*1e3:8.3f} ms")


def bench_mutator():
    from scann_tpu.mutator import MutableDataset

    m = MutableDataset(64)
    v = np.random.default_rng(0).normal(size=64).astype(np.float32)
    t0 = time.perf_counter()
    for i in range(10_000):
        m.add(v)
    dt = (time.perf_counter() - t0) / 10_000
    print(f"mutator/add (native C++ core): {dt*1e6:8.2f} us/op -> {1/dt:,.0f} ops/s")
    t0 = time.perf_counter()
    for i in range(10_000):
        m.get(i)
    dt = (time.perf_counter() - t0) / 10_000
    print(f"mutator/get: {dt*1e6:8.2f} us/op")


def bench_dynamic():
    """Mixed add/search at serving batch size: the dynamic merge is one
    device program (candidates rescore + delta brute force + dedup + top-k),
    so B=1024 must not hit a per-query host loop cliff."""
    from scann_tpu.data.dataset import DenseDataset
    from scann_tpu.models.brute_force import BruteForceSearcher
    from scann_tpu.mutator import DynamicSearcher

    rng = np.random.default_rng(0)
    db = rng.normal(size=(200_000, 64)).astype(np.float32)
    ds = DynamicSearcher(DenseDataset(db), lambda d: BruteForceSearcher(d),
                         rebuild_threshold=100_000)
    q = rng.normal(size=(1024, 64)).astype(np.float32)
    # grow the delta slab into a stable padding bucket (e_pad = 768), then
    # warm up the jitted merge program for that bucket
    for _ in range(520):
        ds.add(rng.normal(size=64).astype(np.float32))
    ds.search_batched_arrays(q, 10)
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        ds.add(rng.normal(size=64).astype(np.float32))
        ds.search_batched_arrays(q, 10)
    dt = (time.perf_counter() - t0) / iters
    print(f"dynamic/mixed add+search B=1024 (200k main + 520 delta): "
          f"{dt*1e3:8.2f} ms/op-pair -> {1024/dt:,.0f} QPS")


GROUPS = {
    "brute_force": bench_brute_force,
    "distances": bench_distances,
    "kmeans": bench_kmeans,
    "lut16": bench_lut16,
    "int8": bench_int8,
    "topk": bench_topk,
    "mutator": bench_mutator,
    "dynamic": bench_dynamic,
}


if __name__ == "__main__":
    wanted = sys.argv[1:] or list(GROUPS)
    for g in wanted:
        print(f"=== {g} ===")
        GROUPS[g]()
