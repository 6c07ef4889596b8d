"""OPQ-style learned rotation (reference: src/projection/opq.rs:54-180).

The reference implements a simplified eigen-based refinement (not full
k-means OPQ): start from a random orthogonal matrix; per iteration rotate
the data, and for each subspace block replace the block-diagonal with the
eigenvectors of that subspace's covariance; re-orthonormalize. We keep the
same algorithm (batched on device via jnp) so behavior matches.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from scann_tpu.errors import ScannError
from scann_tpu.projection.base import Projection
from scann_tpu.utils.linear_algebra import (
    gram_schmidt,
    random_orthogonal_matrix,
    symmetric_eigen,
)


@dataclasses.dataclass
class OpqConfig:
    dim: int
    num_subspaces: int = 8
    num_iterations: int = 10
    seed: int = 42


class OpqProjection(Projection):
    def __init__(self, config: OpqConfig):
        self.config = config
        self.rotation: Optional[np.ndarray] = None  # [D, D], applied as x @ R

    @property
    def input_dim(self) -> int:
        return self.config.dim

    @property
    def output_dim(self) -> int:
        return self.config.dim

    @property
    def is_trainable(self) -> bool:
        return True

    @property
    def is_trained(self) -> bool:
        return self.rotation is not None

    def train(self, data) -> "OpqProjection":
        arr = data.numpy() if hasattr(data, "numpy") else np.asarray(data, np.float32)
        if arr.size == 0:
            raise ScannError.invalid_argument("Cannot train on empty data")
        d = arr.shape[1]
        if d != self.config.dim:
            raise ScannError.invalid_argument("Data dimension does not match config")
        s = self.config.num_subspaces
        if d % s != 0:
            raise ScannError.invalid_argument("Dimension must be divisible by num_subspaces")
        dsub = d // s

        rotation = random_orthogonal_matrix(d, self.config.seed)
        for _ in range(self.config.num_iterations):
            rotated = arr @ rotation
            new_rotation = np.zeros((d, d), dtype=np.float32)
            for si in range(s):
                lo = si * dsub
                block = rotated[:, lo : lo + dsub]
                cov = block.T @ block
                _, vecs = symmetric_eigen(cov)
                new_rotation[lo : lo + dsub, lo : lo + dsub] = vecs
            combined = rotation @ new_rotation
            # re-orthonormalize to fight drift (reference: opq.rs:140-150)
            rotation = gram_schmidt(combined.T).T.astype(np.float32)
            if rotation.shape != (d, d):
                # degenerate gram-schmidt (rank loss): keep previous rotation
                rotation = combined
        self.rotation = rotation.astype(np.float32)
        return self

    def project(self, x: np.ndarray) -> np.ndarray:
        if self.rotation is None:
            raise ScannError.failed_precondition("OPQ not trained")
        return self._check(x) @ self.rotation

    def inverse_project(self, x: np.ndarray) -> Optional[np.ndarray]:
        if self.rotation is None:
            return None
        return np.asarray(x, np.float32) @ self.rotation.T
