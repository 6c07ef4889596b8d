"""Multi-chip database sharding (runs on any device count; use
JAX_PLATFORMS=cpu with jax_num_cpu_devices for a virtual mesh)."""

import jax
import numpy as np

from scann_tpu import BruteForceSearcher, DenseDataset
from scann_tpu.parallel import ShardedBruteForceSearcher, make_mesh

rng = np.random.default_rng(0)
db = rng.normal(size=(4096, 32)).astype(np.float32)
q = rng.normal(size=(16, 32)).astype(np.float32)
ds = DenseDataset(db)

mesh = make_mesh()  # all devices on one "db" axis
print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} device(s)")

sharded = ShardedBruteForceSearcher(ds, mesh=mesh)
idx, dist = sharded.search_batched_arrays(q, 5)

ref_idx, ref_dist = BruteForceSearcher(ds).search_batched_arrays(q, 5)
assert np.allclose(dist, ref_dist, rtol=1e-4, atol=1e-4)
print("sharded top-5 matches single-device exact search; "
      f"first row: {idx[0].tolist()}")
