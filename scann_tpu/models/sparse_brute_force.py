"""Sparse-set brute force: Jaccard / Dice / NonZeroIntersect over sparse
datapoints.

The reference scores sparse points with sorted-index-merge loops
(reference: src/distance_measures/sparse.rs). TPU-native formulation: a
sparse dataset with modest dimensionality densifies to a binary incidence
matrix ``M [N, D] ∈ {0,1}``; then for a query set q (binary [D]):

    intersect = M @ q            (one MXU matmul for the whole batch)
    jaccard   = 1 - I / (|A| + |q| - I)
    dice      = 1 - 2I / (|A| + |q|)
    nzi       = -I

so the entire sweep is one matmul + elementwise transforms. Weighted sparse
vectors (values attached) score real dot/L2 through the same densification.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu.data.dataset import SparseDataset
from scann_tpu.errors import ScannError
from scann_tpu.models.searcher import SearchParameters, Searcher
from scann_tpu.ops.distances import DistanceMeasure
from scann_tpu.ops.topk import top_k_smallest
from scann_tpu.types import MASKED_DISTANCE, SUBLANE_F32, align_up


@functools.partial(jax.jit, static_argnames=("measure", "k"))
def _sparse_search_kernel(incidence, set_sizes, n_valid, q_inc, q_sizes, *,
                          measure: DistanceMeasure, k: int):
    inter = jax.lax.dot_general(
        q_inc, incidence,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, N]
    a = set_sizes[None, :]
    b = q_sizes[:, None]
    if measure == DistanceMeasure.JACCARD:
        union = a + b - inter
        dists = jnp.where(union > 0, 1.0 - inter / jnp.maximum(union, 1.0), 0.0)
    elif measure == DistanceMeasure.DICE:
        total = a + b
        dists = jnp.where(total > 0, 1.0 - 2.0 * inter / jnp.maximum(total, 1.0), 0.0)
    elif measure == DistanceMeasure.NON_ZERO_INTERSECT:
        dists = -inter
    else:
        raise NotImplementedError(measure)
    col = jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
    dists = jnp.where(col < n_valid, dists, MASKED_DISTANCE)
    vals, idx = top_k_smallest(dists, k)
    missing = vals >= MASKED_DISTANCE / 2
    return jnp.where(missing, jnp.inf, vals), jnp.where(missing, -1, idx)


class SparseBruteForceSearcher(Searcher):
    """Exact set-similarity search over a SparseDataset."""

    def __init__(self, dataset: SparseDataset,
                 distance_measure: DistanceMeasure = DistanceMeasure.JACCARD):
        if distance_measure not in (DistanceMeasure.JACCARD, DistanceMeasure.DICE,
                                    DistanceMeasure.NON_ZERO_INTERSECT):
            raise ScannError.invalid_argument(
                f"sparse searcher supports set measures, got {distance_measure}")
        if dataset.dimensionality > 65536:
            raise ScannError.invalid_argument(
                "incidence densification capped at 65536 dims")
        self._dataset = dataset
        self._measure = distance_measure
        n = max(len(dataset), 1)
        n_pad = align_up(n, SUBLANE_F32)
        inc = np.zeros((n_pad, dataset.dimensionality), dtype=np.float32)
        for i in range(len(dataset)):
            inc[i, dataset.get(i).indices] = 1.0
        self._incidence = jnp.asarray(inc)
        self._sizes = jnp.asarray(inc.sum(axis=1))

    def dataset_size(self) -> int:
        return len(self._dataset)

    def dimensionality(self) -> int:
        return self._dataset.dimensionality

    def search_sparse(self, indices, k: int):
        """Search with a sparse query given by its index set."""
        q = np.zeros((1, self.dimensionality()), dtype=np.float32)
        q[0, np.asarray(indices, dtype=np.int64)] = 1.0
        idx, dist = self._search_incidence(q, k)
        return self._to_results(idx, dist)[0]

    def search_batched_arrays(self, queries: np.ndarray, k: int,
                              params: Optional[SearchParameters] = None):
        """Queries as dense 0/1 incidence rows [B, D]."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        return self._search_incidence((q != 0).astype(np.float32), k)

    def _search_incidence(self, q: np.ndarray, k: int):
        if self.dataset_size() == 0:
            raise ScannError.failed_precondition("dataset is empty")
        k = min(int(k), self.dataset_size())
        vals, idx = _sparse_search_kernel(
            self._incidence, self._sizes, jnp.int32(self.dataset_size()),
            jnp.asarray(q), jnp.asarray(q.sum(axis=1)),
            measure=self._measure, k=k,
        )
        return np.asarray(idx), np.asarray(vals)
