"""Tree-×-AH hybrid searcher — the flagship pipeline.

Build (reference: src/tree_x_hybrid/mod.rs:131-237): k-means partitions; a
*global* PQ codebook trained on residuals (point − its partition centroid);
every point encoded as residual codes.

Search (reference: mod.rs:240-364) as ONE device program — the reference
runs a host loop over partitions with scalar LUT scoring and a rayon thread
pool; here the stages fuse into a single jit program with no host round
trips:

    centroid matmul -> top-p partitions
    -> per-(query, partition) residual LUTs (batched einsum, [B*p, S, C])
    -> gather padded leaf lists + their PQ codes
    -> LUT scoring (one-hot matmul on the MXU)
    -> masked merge across partitions -> top-(k·multiplier)
    -> gather raw rows -> exact re-rank -> top-k

Optional restricts enter as a [N] bool allowlist mask fused into scoring
(disallowed candidates get the sentinel distance).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu.data.dataset import DenseDataset
from scann_tpu.errors import ScannError
from scann_tpu.hashes.codebook import Codebook, CodebookConfig, lut_kernel
from scann_tpu.hashes.hasher import AsymmetricHasherConfig
from scann_tpu.models.searcher import SearchParameters, Searcher
from scann_tpu.ops.distances import (
    DistanceMeasure,
    gathered_distances,
    many_to_many,
    squared_norms,
)
from scann_tpu.ops.lut16_scoring import lut_score_gathered
from scann_tpu.ops.topk import approx_top_k_smallest, top_k_smallest
from scann_tpu.partitioning.tree_partitioner import TreePartitioner, TreePartitionerConfig
from scann_tpu.types import MASKED_DISTANCE, SUBLANE_I8, align_up


@dataclasses.dataclass
class TreeXHybridConfig:
    """(reference: src/tree_x_hybrid/mod.rs:20-48)."""

    num_partitions: int = 100
    partitions_to_search: int = 10
    hash_config: AsymmetricHasherConfig = dataclasses.field(
        default_factory=lambda: AsymmetricHasherConfig(num_codes=16, num_subspaces=8)
    )
    use_residuals: bool = True
    pre_reorder_multiplier: float = 3.0
    distance_measure: DistanceMeasure = DistanceMeasure.SQUARED_L2
    # partition balancing cap ("auto" = 1.5x mean, None = off): padded-leaf
    # search cost is p * L_max, so skew directly slows every query
    max_partition_size: Optional[object] = "auto"

    def with_hash(self, cfg: AsymmetricHasherConfig) -> "TreeXHybridConfig":
        self.hash_config = cfg
        return self

    def with_residuals(self, flag: bool) -> "TreeXHybridConfig":
        self.use_residuals = flag
        return self

    def with_pre_reorder(self, multiplier: float) -> "TreeXHybridConfig":
        self.pre_reorder_multiplier = multiplier
        return self


def tree_ah_search(
    db, db_sq_norms, centers, leaf_idx, codes, codebook, queries, n_valid, allow_mask,
    *, p: int, pre_k: int, k: int, use_residuals: bool,
    measure: DistanceMeasure, reorder: bool,
):
    """Fused tree-AH search. Returns (distances [B,k], indices [B,k]; -1 missing).

    Args:
        db: [N_pad, D] raw vectors (for re-ranking).
        db_sq_norms: [N_pad].
        centers: [K, D] partition centroids.
        leaf_idx: [K, L] padded leaf point lists (-1 pad).
        codes: [N_pad, S] uint8 PQ codes (residual codes when use_residuals).
        codebook: [S, C, d_sub].
        allow_mask: [N_pad] bool or None — restrict allowlist.
    """
    b, d = queries.shape
    n_leaf = leaf_idx.shape[1]

    # 1. partition selection (squared-L2 centroid scoring)
    cd = many_to_many(DistanceMeasure.SQUARED_L2, queries, centers)
    _, parts = top_k_smallest(cd, p)                      # [B, p]
    sel_centers = jnp.take(centers, parts, axis=0)        # [B, p, D]

    # 2. per-(query, partition) residual LUTs
    if use_residuals:
        q_eff = queries[:, None, :] - sel_centers          # [B, p, D]
    else:
        q_eff = jnp.broadcast_to(queries[:, None, :], (b, p, d))
    luts = lut_kernel(q_eff.reshape(b * p, d), codebook)   # [B*p, S, C]

    # 3. gather candidates + their codes
    cand = jnp.take(leaf_idx, parts, axis=0)               # [B, p, L]
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)
    cand_codes = jnp.take(codes, safe.reshape(b, p * n_leaf), axis=0)  # [B, p*L, S]

    # 4. LUT scoring per partition block
    scores = lut_score_gathered(
        luts, cand_codes.reshape(b * p, n_leaf, -1)
    ).reshape(b, p * n_leaf)
    flat_cand = cand.reshape(b, p * n_leaf)
    flat_valid = valid.reshape(b, p * n_leaf)
    if allow_mask is not None:
        flat_valid = flat_valid & jnp.take(
            allow_mask, jnp.maximum(flat_cand, 0), axis=0
        )
    scores = jnp.where(flat_valid, scores, MASKED_DISTANCE)

    if not reorder:
        vals, pos = top_k_smallest(scores, k)
        idx = jnp.take_along_axis(flat_cand, pos, axis=1)
        missing = vals >= MASKED_DISTANCE / 2
        return jnp.where(missing, jnp.inf, vals), jnp.where(missing, -1, idx)

    # 5. merge -> top-(k * multiplier); approximate selection, exact
    # re-rank below recovers the recall_target loss
    pre_vals, pre_pos = approx_top_k_smallest(scores, pre_k)
    pre_cand = jnp.take_along_axis(flat_cand, pre_pos, axis=1)   # [B, pre_k]
    pre_valid = pre_vals < MASKED_DISTANCE / 2
    pre_safe = jnp.maximum(pre_cand, 0)

    # 6. exact re-rank
    rows = jnp.take(db, pre_safe, axis=0)                         # [B, pre_k, D]
    norms = jnp.take(db_sq_norms, pre_safe, axis=0)
    exact = gathered_distances(measure, queries, rows, norms)
    exact = jnp.where(pre_valid, exact, MASKED_DISTANCE)
    vals, pos = top_k_smallest(exact, k)
    idx = jnp.take_along_axis(pre_cand, pos, axis=1)
    missing = vals >= MASKED_DISTANCE / 2
    return jnp.where(missing, jnp.inf, vals), jnp.where(missing, -1, idx)


tree_ah_kernel = jax.jit(
    tree_ah_search,
    static_argnames=("p", "pre_k", "k", "use_residuals", "measure", "reorder"),
)


def tree_ah_search_csr(
    db, db_sq_norms, centers, codes_csr, csr_offsets, part_sizes, perm,
    codebook, queries, n_valid, allow_mask,
    *, p: int, pre_k: int, k: int, l_cap: int, use_residuals: bool,
    measure: DistanceMeasure, interpret: bool = False,
):
    """CSR fast path: leaf scoring via the scalar-prefetch Pallas kernel
    (ops/tree_ah_pallas.py) — codes DMA'd per selected partition instead of
    gathered per candidate. Requires balanced partitions (size <= l_cap).

    codes_csr: [S, N_pad] u8 transposed, partition-contiguous along N;
    perm[r] = original id of CSR row r; csr_offsets [K], part_sizes [K].
    """
    from scann_tpu.ops.tree_ah_pallas import tree_ah_leaf_scores_pallas

    b, d = queries.shape
    cd = many_to_many(DistanceMeasure.SQUARED_L2, queries, centers)
    _, parts = top_k_smallest(cd, p)                          # [B, p]
    sel_centers = jnp.take(centers, parts, axis=0)            # [B, p, D]

    if use_residuals:
        q_eff = queries[:, None, :] - sel_centers
    else:
        q_eff = jnp.broadcast_to(queries[:, None, :], (b, p, d))
    s_dims, c_codes = codebook.shape[0], codebook.shape[1]
    luts = lut_kernel(q_eff.reshape(b * p, d), codebook).reshape(b, p, s_dims, c_codes)

    offsets = jnp.take(csr_offsets, parts, axis=0)            # [B, p]
    sizes = jnp.take(part_sizes, parts, axis=0)               # [B, p]
    scores = tree_ah_leaf_scores_pallas(
        luts, codes_csr, offsets, sizes, l_cap=l_cap, interpret=interpret)

    # candidate CSR rows -> original ids
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (b, p, l_cap), 2)
    csr_rows = jnp.minimum(offsets[:, :, None] + iota_l, perm.shape[0] - 1)
    cand = jnp.take(perm, csr_rows.reshape(b, p * l_cap), axis=0)  # [B, C]
    flat_scores = scores.reshape(b, p * l_cap)
    if allow_mask is not None:
        allowed = jnp.take(allow_mask, jnp.maximum(cand, 0), axis=0)
        flat_scores = jnp.where(allowed, flat_scores, MASKED_DISTANCE)

    pre_vals, pre_pos = approx_top_k_smallest(flat_scores, pre_k)
    pre_cand = jnp.take_along_axis(cand, pre_pos, axis=1)
    pre_valid = pre_vals < MASKED_DISTANCE / 2
    pre_safe = jnp.maximum(pre_cand, 0)

    rows = jnp.take(db, pre_safe, axis=0)
    norms = jnp.take(db_sq_norms, pre_safe, axis=0)
    exact = gathered_distances(measure, queries, rows, norms)
    exact = jnp.where(pre_valid, exact, MASKED_DISTANCE)
    vals, pos = top_k_smallest(exact, k)
    idx = jnp.take_along_axis(pre_cand, pos, axis=1)
    missing = vals >= MASKED_DISTANCE / 2
    return jnp.where(missing, jnp.inf, vals), jnp.where(missing, -1, idx)


tree_ah_csr_kernel = jax.jit(
    tree_ah_search_csr,
    static_argnames=("p", "pre_k", "k", "l_cap", "use_residuals", "measure",
                     "interpret"),
)


class TreeXHybridSearcher(Searcher):
    """Partitioning + residual PQ + exact re-rank
    (reference: src/tree_x_hybrid/mod.rs:93-110)."""

    def __init__(self, config: Optional[TreeXHybridConfig] = None):
        self.config = config or TreeXHybridConfig()
        self.partitioner: Optional[TreePartitioner] = None
        self.codebook: Optional[Codebook] = None
        self.codes: Optional[np.ndarray] = None
        self._dataset: Optional[DenseDataset] = None
        self._codes_dev = None
        self._norms_cache = None

    # -- build ----------------------------------------------------------------
    def build(self, dataset: DenseDataset) -> "TreeXHybridSearcher":
        if dataset.is_empty:
            raise ScannError.invalid_argument("Cannot build from empty dataset")
        cfg = self.config
        self._dataset = dataset
        data = dataset.numpy()
        n = len(data)

        self.partitioner = TreePartitioner(TreePartitionerConfig(
            num_partitions=cfg.num_partitions,
            seed=cfg.hash_config.seed if cfg.hash_config.seed is not None else 42,
            max_partition_size=cfg.max_partition_size,
        )).build(dataset)

        if cfg.use_residuals:
            tokens = self.partitioner.tokenization.tokens
            # residuals on device — the host CPU may be far slower than the
            # chip for a [N, D] gather+subtract at million scale
            train_data = np.asarray(jax.jit(
                lambda x, c, t: x - jnp.take(c, t, axis=0)
            )(jnp.asarray(data), jnp.asarray(self.partitioner.centers),
              jnp.asarray(tokens)))
        else:
            train_data = data

        hc = cfg.hash_config
        sample = train_data
        if hc.training_sample_size < n:
            rng = np.random.default_rng(hc.seed if hc.seed is not None else 42)
            sample = train_data[rng.choice(n, hc.training_sample_size, replace=False)]

        self.codebook = Codebook(CodebookConfig(
            num_codes=hc.num_codes,
            num_subspaces=hc.num_subspaces,
            max_iterations=hc.max_iterations,
            seed=hc.seed,
        )).train(sample)

        self.codes = self.codebook.encode_dataset(train_data)
        self._codes_dev = None
        self._norms_cache = None
        self._csr_cache = None
        return self

    # -- metadata ---------------------------------------------------------------
    def dataset_size(self) -> int:
        return 0 if self._dataset is None else self._dataset.size

    def dimensionality(self) -> int:
        return 0 if self._dataset is None else self._dataset.dimensionality

    def _docids(self):
        return self._dataset.docids if self._dataset is not None else None

    def memory_usage(self) -> int:
        """PQ code bytes (packed when 4-bit) + centroids + codebook."""
        code_bytes = self.codes.shape[0] * ((self.codes.shape[1] + 1) // 2) \
            if self.codebook.num_codes <= 16 else self.codes.nbytes
        return int(code_bytes + self.partitioner.centers.nbytes
                   + self.codebook.centroids.nbytes)

    def _device_state(self):
        db, n = self._dataset.device()
        if self._norms_cache is None or self._norms_cache[0] != n:
            self._norms_cache = (n, jax.jit(squared_norms)(db))
        if self._codes_dev is None:
            n_pad = align_up(max(n, 1), SUBLANE_I8)
            codes = np.zeros((max(n_pad, db.shape[0]), self.codes.shape[1]), dtype=np.uint8)
            codes[:n] = self.codes
            # codes indexable by any db row id (incl. padding)
            if codes.shape[0] < db.shape[0]:
                codes = np.pad(codes, ((0, db.shape[0] - codes.shape[0]), (0, 0)))
            self._codes_dev = jnp.asarray(codes[: db.shape[0]])
        return db, self._norms_cache[1], n

    def _csr_state(self):
        """CSR device layout for the Pallas leaf-scoring fast path."""
        if getattr(self, "_csr_cache", None) is None:
            self._device_state()
            tk = self.partitioner.tokenization
            l_cap = int(align_up(max(tk.max_partition_size, 8), 128))
            # 128-align every partition's CSR start (DMA lane tiling)
            k = tk.num_partitions
            sizes = tk.partition_sizes
            aligned = np.zeros(k + 1, dtype=np.int64)
            aligned[1:] = np.cumsum(
                ((sizes.astype(np.int64) + 127) // 128) * 128)
            total = int(aligned[-1]) + l_cap
            perm_aligned = np.zeros(total, dtype=np.int32)
            valid_rows = np.zeros(total, dtype=bool)
            for t in range(k):
                lo, sz = int(aligned[t]), int(sizes[t])
                perm_aligned[lo : lo + sz] = tk.partition_indices(t)
                valid_rows[lo : lo + sz] = True
            s_pad = int(align_up(self.codes.shape[1], 32))
            perm = jnp.asarray(perm_aligned)
            codes_csr = jax.jit(
                lambda c, pm: jnp.pad(
                    jnp.take(c, pm, axis=0),
                    ((0, 0), (0, s_pad - c.shape[1]))).T
            )(self._codes_dev, perm)
            self._csr_cache = (
                codes_csr,
                jnp.asarray(aligned[:-1].astype(np.int32)),
                jnp.asarray(sizes.astype(np.int32)),
                perm,
                l_cap,
            )
        return self._csr_cache

    def _use_csr_pallas(self) -> bool:
        try:
            return jax.devices()[0].platform == "tpu"
        except Exception:  # pragma: no cover
            return False

    # -- search -----------------------------------------------------------------
    def search_batched_arrays(self, queries: np.ndarray, k: int,
                              params: Optional[SearchParameters] = None,
                              allow_mask: Optional[np.ndarray] = None):
        self._check_built()
        queries = self._validate_queries(queries)
        cfg = self.config
        n = self.dataset_size()
        k = min(int(k), n)
        if k <= 0:
            raise ScannError.invalid_argument(f"k must be positive, got {k}")

        p = cfg.partitions_to_search
        if params is not None and params.num_leaves_to_search is not None:
            p = params.num_leaves_to_search
        p = min(int(p), self.partitioner.num_partitions)

        if params is not None and params.pre_reordering_num_neighbors is not None:
            pre_k = int(params.pre_reordering_num_neighbors)
        else:
            pre_k = int(np.ceil(k * cfg.pre_reorder_multiplier))

        db, norms, n_valid = self._device_state()
        use_csr = self._use_csr_pallas()
        if use_csr:
            max_leaf = int(align_up(
                max(self.partitioner.tokenization.max_partition_size, 8), 128))
        else:
            leaves = self.partitioner.tokenization.padded_leaves()
            max_leaf = leaves.shape[1]
        max_cand = p * max_leaf
        pre_k = min(max(pre_k, k), max_cand)
        k_eff = min(k, max_cand)

        mask_dev = None
        if allow_mask is not None:
            m = np.zeros(db.shape[0], dtype=bool)
            m[: len(allow_mask)] = np.asarray(allow_mask, dtype=bool)[:n_valid]
            mask_dev = jnp.asarray(m)

        if use_csr:
            codes_csr, csr_offsets, part_sizes, perm, l_cap = self._csr_state()
            pre_k = min(pre_k, p * l_cap)
            dists, idx = tree_ah_csr_kernel(
                db, norms, self.partitioner.centers_device(), codes_csr,
                csr_offsets, part_sizes, perm,
                self.codebook.centroids_device(), jnp.asarray(queries),
                jnp.int32(n_valid), mask_dev,
                p=p, pre_k=pre_k, k=k_eff, l_cap=l_cap,
                use_residuals=cfg.use_residuals, measure=cfg.distance_measure,
            )
        else:
            dists, idx = tree_ah_kernel(
                db, norms, self.partitioner.centers_device(), leaves,
                self._codes_dev, self.codebook.centroids_device(),
                jnp.asarray(queries), jnp.int32(n_valid), mask_dev,
                p=p, pre_k=pre_k, k=k_eff, use_residuals=cfg.use_residuals,
                measure=cfg.distance_measure, reorder=True,
            )
        return np.asarray(idx), np.asarray(dists)

    def _check_built(self):
        if self.codebook is None or self.partitioner is None:
            raise ScannError.failed_precondition("searcher not built")
