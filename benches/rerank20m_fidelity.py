"""Rerank-codec fidelity at 20M, isolated from candidate generation.

The served 20M A/B (benches/rerank20m_int8.py) measured the
residual-anchored min/max int8 codec at −2.4pp recall@10 vs bf16. This
script isolates the CODEC: compute the exact top-150 candidates per query
(a perfect candidate generator at the served row's pre_k), then re-rank
those same candidates under each codec on host — bf16, residual int8 with
min/max calibration, and residual int8 with ±σ clipping — and score
recall@10 of the codec ranking against the exact top-10. One 20M pass
computes the per-dim residual stats; anchors are the generator's true
cluster centers (regenerated from the cached dataset's seed) — a best-case
stand-in for the tree's k-means centroids, fine for comparing codecs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/rerank20m_fidelity.py
"""

import os
import time

import numpy as np

N = int(os.environ.get("R20_N", 20_000_000))
D, B, PRE_K, K = 100, 1024, 150, 10
NC = max(N // 250, 8)
SEED = 7


def log(*a):
    print(*a, flush=True)


def main():
    import ml_dtypes

    t0 = time.perf_counter()
    cache_db = f"/tmp/crossover_{N}_{D}_{SEED}_db.npy"
    cache_q = f"/tmp/crossover_{N}_{D}_{SEED}_q{B}.npy"
    db, q = np.load(cache_db), np.load(cache_q)
    log(f"loaded cached dataset: {time.perf_counter()-t0:.1f}s")

    # regenerate the generator's centers + assignments (drawn before the
    # db noise in benches/rerank20m_int8.py, so the prefix of the stream
    # is identical)
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((NC, D), dtype=np.float32) * 2.5
    a = rng.integers(0, NC, N)

    cache_gt = f"/tmp/crossover_{N}_{D}_{SEED}_gt{B}_k{PRE_K}.npy"
    t0 = time.perf_counter()
    if os.path.exists(cache_gt):
        gt = np.load(cache_gt)
        log(f"loaded top-{PRE_K} GT: {time.perf_counter()-t0:.1f}s")
    else:
        from scann_tpu import BruteForceSearcher, DenseDataset

        bf = BruteForceSearcher(DenseDataset(db))
        qc = max(8, min(128, int(2.5e9 / (4 * N)) & ~7))
        gt = np.concatenate([
            bf.search_batched_arrays(q[i : i + qc], PRE_K)[0]
            for i in range(0, B, qc)], axis=0)
        np.save(cache_gt, gt)
        log(f"exact top-{PRE_K} GT: {time.perf_counter()-t0:.1f}s")

    # one 20M pass: per-dim residual min/max/mean/std
    t0 = time.perf_counter()
    d = D
    resid_mn = np.full(d, np.inf, np.float32)
    resid_mx = np.full(d, -np.inf, np.float32)
    s1 = np.zeros(d, np.float64)
    s2 = np.zeros(d, np.float64)
    cs = (1 << 22) // d
    for lo in range(0, N, cs):
        r = db[lo:lo + cs] - centers[a[lo:lo + cs]]
        resid_mn = np.minimum(resid_mn, r.min(axis=0))
        resid_mx = np.maximum(resid_mx, r.max(axis=0))
        s1 += r.sum(axis=0, dtype=np.float64)
        s2 += np.einsum("nd,nd->d", r, r, dtype=np.float64)
    mean = (s1 / N).astype(np.float32)
    std = np.sqrt(np.maximum(s2 / N - mean.astype(np.float64) ** 2, 0)
                  ).astype(np.float32)
    log(f"residual stats pass: {time.perf_counter()-t0:.1f}s; "
        f"range/std p50={np.median((resid_mx-resid_mn)/np.maximum(std,1e-9)):.1f} "
        f"max={((resid_mx-resid_mn)/np.maximum(std,1e-9)).max():.1f}")

    # candidate rows + their residual anchors
    rows = db[gt]                       # [B, PRE_K, D] f32
    toks = a[gt]
    anchors = centers[toks]
    exact_d = ((q[:, None, :] - rows) ** 2).sum(-1)
    exact_top = np.argsort(exact_d, axis=1, kind="stable")[:, :K]
    gt10 = np.take_along_axis(gt, exact_top, axis=1)

    def recall_of(dec_rows):
        dd = ((q[:, None, :] - dec_rows) ** 2).sum(-1)
        top = np.argsort(dd, axis=1, kind="stable")[:, :K]
        ids = np.take_along_axis(gt, top, axis=1)
        return np.mean([len(set(x) & set(y)) / K for x, y in zip(ids, gt10)])

    log(f"bf16: recall@10 = "
        f"{recall_of(rows.astype(ml_dtypes.bfloat16).astype(np.float32)):.4f}")

    for label, lo_c, hi_c in (
        ("int8 resid min/max", resid_mn, resid_mx),
        ("int8 resid clip4σ", np.maximum(resid_mn, mean - 4 * std),
         np.minimum(resid_mx, mean + 4 * std)),
        ("int8 resid clip3σ", np.maximum(resid_mn, mean - 3 * std),
         np.minimum(resid_mx, mean + 3 * std)),
        ("int8 resid clip2.5σ", np.maximum(resid_mn, mean - 2.5 * std),
         np.minimum(resid_mx, mean + 2.5 * std)),
    ):
        scale = np.maximum((hi_c - lo_c) / 255.0, 1e-30).astype(np.float32)
        codes = np.clip(np.rint((rows - anchors - lo_c) / scale),
                        0, 255).astype(np.uint8)
        dec = codes.astype(np.float32) * scale + lo_c + anchors
        log(f"{label}: recall@10 = {recall_of(dec):.4f} "
            f"(step/σ p50={np.median(scale/np.maximum(std,1e-9)):.3f})")


if __name__ == "__main__":
    main()
