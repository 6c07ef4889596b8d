"""Partitioning data structures.

The reference keeps per-partition point lists as ``Vec<Vec<u32>>``
(reference: src/partitioning/partitioner.rs:133-177). Ragged vectors don't
exist inside an XLA program, so the device layout is:

  - CSR: ``offsets [K+1] int32`` + ``point_indices [N] int32`` (points sorted
    by token) — compact, used for stats and host iteration;
  - padded leaves: ``leaf_indices [K, L_max] int32`` with -1 padding — what
    the fused search program gathers from (static shapes, masked scoring).

``PartitionResult`` mirrors partitioner.rs:12-59.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from scann_tpu.errors import ScannError


@dataclasses.dataclass
class PartitionResult:
    """Query-side partition selection (reference: partitioner.rs:12-59)."""

    tokens: np.ndarray      # [p] int32 selected partition ids, nearest first
    distances: np.ndarray   # [p] f32 centroid distances

    def top_token(self) -> int:
        return int(self.tokens[0])


class DatabaseTokenization:
    """Token assignment tables (reference: partitioner.rs:133-177).

    Supports *spilling* (multi-assignment): pass ``extra_pairs`` as
    (point_index, token) rows to duplicate points into additional
    partitions — the reference declares spilling in its config but never
    implements it in the search path (SURVEY §2.3); here spilled points
    genuinely appear in several leaves.
    """

    def __init__(self, tokens: np.ndarray, num_partitions: int,
                 extra_pairs: "np.ndarray | None" = None):
        tokens = np.asarray(tokens, dtype=np.int32)
        self.tokens = tokens
        self.num_partitions = int(num_partitions)
        pts = np.arange(len(tokens), dtype=np.int32)
        toks = tokens
        if extra_pairs is not None and len(extra_pairs):
            extra_pairs = np.asarray(extra_pairs, dtype=np.int32)
            pts = np.concatenate([pts, extra_pairs[:, 0]])
            toks = np.concatenate([toks, extra_pairs[:, 1]])
        if len(toks) and (toks.min() < 0 or toks.max() >= num_partitions):
            raise ScannError.invalid_argument(
                f"tokens must lie in [0, {num_partitions}); got range "
                f"[{int(toks.min())}, {int(toks.max())}]")
        order = np.argsort(toks, kind="stable")
        counts = np.bincount(toks, minlength=num_partitions).astype(np.int32)
        self.offsets = np.zeros(num_partitions + 1, dtype=np.int32)
        np.cumsum(counts, out=self.offsets[1:])
        self.point_indices = pts[order].astype(np.int32)
        self.partition_sizes = counts
        self._padded_cache = None

    @classmethod
    def from_csr(cls, tokens: np.ndarray, offsets: np.ndarray,
                 point_indices: np.ndarray) -> "DatabaseTokenization":
        """Reconstruct from serialized CSR arrays (preserves spilling's
        multi-assignments, which primary tokens alone cannot encode)."""
        self = cls.__new__(cls)
        self.tokens = np.asarray(tokens, dtype=np.int32)
        self.offsets = np.asarray(offsets, dtype=np.int32)
        self.num_partitions = len(self.offsets) - 1
        self.point_indices = np.asarray(point_indices, dtype=np.int32)
        self.partition_sizes = np.diff(self.offsets).astype(np.int32)
        self._padded_cache = None
        return self

    @property
    def max_partition_size(self) -> int:
        return int(self.partition_sizes.max()) if len(self.partition_sizes) else 0

    @property
    def max_multiplicity(self) -> int:
        """Largest number of leaves any single point is assigned to (1
        without spilling). Searchers over-fetch by this factor and dedup so
        spilled duplicates cannot consume result slots."""
        if getattr(self, "_max_multiplicity", None) is None:
            if len(self.point_indices) == 0:
                self._max_multiplicity = 1
            else:
                self._max_multiplicity = int(
                    np.bincount(self.point_indices).max())
        return self._max_multiplicity

    def partition_indices(self, token: int) -> np.ndarray:
        """Point indices in one partition (reference: tree_partitioner.rs:196-213)."""
        return self.point_indices[self.offsets[token] : self.offsets[token + 1]]

    def partition_lists(self) -> List[np.ndarray]:
        return [self.partition_indices(t) for t in range(self.num_partitions)]

    def padded_leaves(self, pad_multiple: int = 8):
        """(leaf_indices [K, L_max] int32 device array, -1 padded). L_max is
        rounded up to ``pad_multiple`` to stabilize compiled shapes across
        small rebuilds."""
        # cache keyed on the multiple: a second caller with a different
        # alignment must not get the first caller's padding
        if self._padded_cache is None or self._padded_cache[0] != pad_multiple:
            lmax = self.max_partition_size
            lmax = max(((lmax + pad_multiple - 1) // pad_multiple) * pad_multiple, pad_multiple)
            out = np.full((self.num_partitions, lmax), -1, dtype=np.int32)
            for t in range(self.num_partitions):
                idx = self.partition_indices(t)
                out[t, : len(idx)] = idx
            self._padded_cache = (pad_multiple, jnp.asarray(out))
        return self._padded_cache[1]
