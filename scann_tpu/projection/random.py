"""Random projections (reference: src/projection/random.rs:40-180)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu.projection.base import Projection
from scann_tpu.utils.linear_algebra import random_orthogonal_matrix


class RandomOrthogonalProjection(Projection):
    """Rows of a random orthogonal matrix (reference: random.rs:40-107)."""

    def __init__(self, input_dim: int, output_dim: Optional[int] = None, seed: int = 42):
        from scann_tpu.errors import ScannError

        self._in = int(input_dim)
        self._out = int(output_dim) if output_dim is not None else self._in
        if not 0 < self._out <= self._in:
            raise ScannError.invalid_argument(
                f"output_dim must be in (0, {self._in}], got {self._out}")
        full = random_orthogonal_matrix(self._in, seed)
        self.matrix = full[: self._out]  # [out, in]

    @property
    def input_dim(self) -> int:
        return self._in

    @property
    def output_dim(self) -> int:
        return self._out

    def project(self, x: np.ndarray) -> np.ndarray:
        return self._check(x) @ self.matrix.T

    def inverse_project(self, x: np.ndarray) -> Optional[np.ndarray]:
        # orthogonal rows: transpose is the (pseudo-)inverse
        return np.asarray(x, np.float32) @ self.matrix


class RandomGaussianProjection(Projection):
    """JL-style dense Gaussian projection scaled by 1/sqrt(out)
    (reference: random.rs:109-180)."""

    def __init__(self, input_dim: int, output_dim: int, seed: int = 42):
        self._in = int(input_dim)
        self._out = int(output_dim)
        key = jax.random.PRNGKey(seed)
        g = jax.random.normal(key, (self._out, self._in), dtype=jnp.float32)
        self.matrix = np.asarray(g) / np.sqrt(self._out)

    @property
    def input_dim(self) -> int:
        return self._in

    @property
    def output_dim(self) -> int:
        return self._out

    def project(self, x: np.ndarray) -> np.ndarray:
        return self._check(x) @ self.matrix.T
