"""Exact re-ranking helper (reference: src/utils/reordering.rs:8-123).

Device path: gather candidate rows, one einsum, top-k — used standalone here
and fused inside the tree-AH / hasher programs. The reference re-scores
candidates in a host loop (rayon above 100 candidates).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu.ops.distances import DistanceMeasure, gathered_distances
from scann_tpu.ops.topk import top_k_smallest
from scann_tpu.types import MASKED_DISTANCE


@functools.partial(jax.jit, static_argnames=("measure", "k"))
def reorder_kernel(db, db_sq_norms, queries, candidates, *, measure: DistanceMeasure, k: int):
    """Re-rank candidate lists by exact distance.

    Args:
        db: [N, D]; db_sq_norms: [N]; queries: [B, D];
        candidates: [B, C] int32 (-1 = missing).

    Returns (dists [B, k], indices [B, k]) sorted ascending, -1/inf padded.
    """
    valid = candidates >= 0
    safe = jnp.maximum(candidates, 0)
    rows = jnp.take(db, safe, axis=0)
    norms = jnp.take(db_sq_norms, safe, axis=0)
    dists = gathered_distances(measure, queries, rows, norms)
    dists = jnp.where(valid, dists, MASKED_DISTANCE)
    vals, pos = top_k_smallest(dists, k)
    idx = jnp.take_along_axis(candidates, pos, axis=1)
    missing = vals >= MASKED_DISTANCE / 2
    return jnp.where(missing, jnp.inf, vals), jnp.where(missing, -1, idx)


class ReorderingHelper:
    """(reference: reordering.rs:8-94)."""

    def __init__(self, distance_measure: DistanceMeasure = DistanceMeasure.SQUARED_L2):
        self.distance_measure = distance_measure

    def reorder(self, dataset, queries: np.ndarray, candidates: np.ndarray,
                k: int) -> Tuple[np.ndarray, np.ndarray]:
        """dataset: DenseDataset; queries [B, D]; candidates [B, C] indices."""
        db, n = dataset.device()
        norms = jnp.sum(db.astype(jnp.float32) ** 2, axis=1)
        q = jnp.asarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None, :]
        cand = jnp.asarray(np.asarray(candidates, np.int32))
        if cand.ndim == 1:
            cand = cand[None, :]
        vals, idx = reorder_kernel(db, norms, q, cand,
                                   measure=self.distance_measure, k=min(k, cand.shape[1]))
        return np.asarray(idx), np.asarray(vals)
