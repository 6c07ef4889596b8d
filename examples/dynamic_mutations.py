"""Dynamic add/remove/update serving (reference analog: mutator examples)."""
import numpy as np

from scann_tpu import BruteForceSearcher, DenseDataset
from scann_tpu.mutator import DynamicSearcher

rng = np.random.default_rng(1)
db = rng.normal(size=(5_000, 32)).astype(np.float32)
ds = DynamicSearcher(DenseDataset(db), BruteForceSearcher, rebuild_threshold=500)

q = rng.normal(size=32).astype(np.float32)
new_id = ds.add(q)                         # insert an exact match
idx, dist = ds.search_batched_arrays(q, 1)
assert idx[0, 0] == new_id and dist[0, 0] < 1e-6
ds.remove(new_id)
idx, _ = ds.search_batched_arrays(q, 1)
assert idx[0, 0] != new_id
print("dynamic lifecycle OK; size =", ds.size)
