"""Exact brute-force search (reference analog: examples/basic_bruteforce.rs)."""
import numpy as np

from scann_tpu import BruteForceSearcher, DenseDataset, DistanceMeasure

rng = np.random.default_rng(42)
db = rng.normal(size=(10_000, 64)).astype(np.float32)
searcher = BruteForceSearcher(DenseDataset(db), DistanceMeasure.SQUARED_L2)

query = db[123] + rng.normal(size=64).astype(np.float32) * 0.01
result = searcher.search(query, k=5)
for n in result:
    print(f"  idx={n.index:5d}  dist={n.distance:.4f}")
assert result.neighbors[0].index == 123
