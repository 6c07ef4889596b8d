"""Projections: dimensionality reduction / rotation pre-processing for
hashing (reference: src/projection/).

All projections share the interface: ``project(x [.., D_in]) -> [.., D_out]``
(batched, device-friendly matmuls), optional ``inverse_project``, and a
``ProjectionFactory`` mirroring the reference's enum dispatch
(reference: src/projection/mod.rs:98-193).
"""

from scann_tpu.projection.base import Projection, IdentityProjection, ProjectionFactory
from scann_tpu.projection.pca import PcaProjection
from scann_tpu.projection.random import RandomOrthogonalProjection, RandomGaussianProjection
from scann_tpu.projection.opq import OpqProjection, OpqConfig
from scann_tpu.projection.truncate import TruncateProjection
from scann_tpu.projection.chunking import ChunkingProjection, ChunkingConfig

__all__ = [
    "Projection",
    "IdentityProjection",
    "ProjectionFactory",
    "PcaProjection",
    "RandomOrthogonalProjection",
    "RandomGaussianProjection",
    "OpqProjection",
    "OpqConfig",
    "TruncateProjection",
    "ChunkingProjection",
    "ChunkingConfig",
]
