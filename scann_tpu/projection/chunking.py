"""Chunking projection for PQ subspace pre-processing
(reference: src/projection/chunking.rs:10-180)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from scann_tpu.errors import ScannError
from scann_tpu.projection.base import Projection


@dataclasses.dataclass
class ChunkingConfig:
    input_dim: int
    num_chunks: int
    project_chunks: bool = False
    chunk_output_dim: Optional[int] = None

    def __post_init__(self):
        if self.input_dim % self.num_chunks != 0:
            raise ScannError.invalid_argument(
                "input_dim must be divisible by num_chunks")

    def with_projection(self, output_dim_per_chunk: int) -> "ChunkingConfig":
        self.project_chunks = True
        self.chunk_output_dim = output_dim_per_chunk
        return self


class ChunkingProjection(Projection):
    """Splits vectors into equal chunks, each optionally projected."""

    def __init__(self, config: ChunkingConfig):
        self.config = config
        self.chunk_dim = config.input_dim // config.num_chunks
        self.chunk_projections: List[Optional[Projection]] = [None] * config.num_chunks
        if config.project_chunks:
            # honor with_projection(): seed-deterministic random-orthogonal
            # per chunk (train-free; callers wanting learned per-chunk
            # projections install them via set_chunk_projection)
            from scann_tpu.projection.random import RandomOrthogonalProjection

            out = config.chunk_output_dim
            if out is None or not 0 < out <= self.chunk_dim:
                raise ScannError.invalid_argument(
                    f"chunk_output_dim must be in (0, {self.chunk_dim}], "
                    f"got {out}")
            for i in range(config.num_chunks):
                self.chunk_projections[i] = RandomOrthogonalProjection(
                    self.chunk_dim, out, seed=42 + i)

    @property
    def input_dim(self) -> int:
        return self.config.input_dim

    @property
    def output_dim(self) -> int:
        total = 0
        for p in self.chunk_projections:
            total += p.output_dim if p is not None else self.chunk_dim
        return total

    def set_chunk_projection(self, chunk_idx: int, projection: Projection) -> None:
        if projection.input_dim != self.chunk_dim:
            raise ScannError.invalid_argument(
                f"chunk projection input {projection.input_dim} != chunk dim {self.chunk_dim}")
        self.chunk_projections[chunk_idx] = projection

    def chunks(self, x: np.ndarray) -> List[np.ndarray]:
        """Split [.., D] into num_chunks arrays [.., chunk_dim]."""
        x = self._check(x)
        return [x[..., i * self.chunk_dim : (i + 1) * self.chunk_dim]
                for i in range(self.config.num_chunks)]

    def project(self, x: np.ndarray) -> np.ndarray:
        parts = []
        for i, chunk in enumerate(self.chunks(x)):
            p = self.chunk_projections[i]
            parts.append(p.project(chunk) if p is not None else chunk)
        return np.concatenate(parts, axis=-1)
