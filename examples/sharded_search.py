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

# --- sharded BUILD + warm start (tree-×-AH) --------------------------------
# The index trains with the database only ever row-sharded (k-means via
# psum Lloyd steps, LBG balance, per-shard residual PQ encode), then the
# per-shard serving layout persists so a restart skips the re-layout.
from scann_tpu import SearchParameters
from scann_tpu.hashes.hasher import AsymmetricHasherConfig
from scann_tpu.models.tree_x_hybrid import TreeXHybridConfig
from scann_tpu.parallel.sharded_flagship import ShardedTreeXHybridSearcher

tree = ShardedTreeXHybridSearcher.build(
    ds,
    TreeXHybridConfig(num_partitions=16, partitions_to_search=8,
                      hash_config=AsymmetricHasherConfig(
                          num_codes=16, num_subspaces=8, seed=0,
                          max_iterations=6)),
    mesh)
params = SearchParameters(pre_reordering_num_neighbors=80)
t_idx, _ = tree.search_batched_arrays(q, 5, params)

import tempfile, os
path = os.path.join(tempfile.mkdtemp(), "layout.npz")
tree.save_layout(path)
warm = ShardedTreeXHybridSearcher.load_layout(path, mesh)
w_idx, _ = warm.search_batched_arrays(q, 5, params)
assert np.array_equal(t_idx, w_idx)
print("sharded build + warm-start reload: identical answers")

# --- hands-free: mesh-aware auto() -----------------------------------------
# Past the one-chip serving budget (chip profile), Scann.auto(mesh=...)
# routes to the sharded end-to-end build by itself and stamps the decision:
from scann_tpu.models.scann import Scann

auto = Scann.auto(ds, mesh=mesh)
print("auto() decision:", auto.describe().get("auto"))
a_idx, _ = auto.search_batched_arrays(q, 5)
print("mesh-aware auto() served", a_idx.shape, "results")
