"""Tree-x-AH hybrid with exact re-ranking (reference analog: examples/)."""
import numpy as np

from scann_tpu import DenseDataset, ScannBuilder, SearchParameters

rng = np.random.default_rng(0)
centers = rng.normal(size=(64, 96)).astype(np.float32) * 3
db = (centers[rng.integers(0, 64, 20_000)]
      + rng.normal(size=(20_000, 96))).astype(np.float32)

searcher = (ScannBuilder()
            .num_neighbors(10)
            .tree(num_partitions=64, partitions_to_search=8)
            .hash(num_blocks=48, num_buckets=16)
            .reorder(100)
            .build(DenseDataset(db)))

queries = db[:32] + rng.normal(size=(32, 96)).astype(np.float32) * 0.05
idx, dist = searcher.search_batched_arrays(queries)
print("self-recall@1:", float((idx[:, 0] == np.arange(32)).mean()))
