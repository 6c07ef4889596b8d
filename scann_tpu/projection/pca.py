"""PCA projection (reference: src/projection/pca.rs:48-205), backed by the
on-device SVD in utils/linear_algebra."""

from __future__ import annotations

from typing import Optional

import numpy as np

from scann_tpu.errors import ScannError
from scann_tpu.projection.base import Projection
from scann_tpu.utils.linear_algebra import PcaResult, fit_pca


class PcaProjection(Projection):
    def __init__(self, input_dim: int, output_dim: int):
        self._in = int(input_dim)
        self._out = int(output_dim)
        self.result: Optional[PcaResult] = None

    @property
    def input_dim(self) -> int:
        return self._in

    @property
    def output_dim(self) -> int:
        return self._out

    @property
    def is_trainable(self) -> bool:
        return True

    @property
    def is_trained(self) -> bool:
        return self.result is not None

    def train(self, data) -> "PcaProjection":
        arr = data.numpy() if hasattr(data, "numpy") else np.asarray(data, np.float32)
        if arr.shape[1] != self._in:
            raise ScannError.invalid_argument("training data dim mismatch")
        self.result = fit_pca(arr, self._out)
        return self

    def project(self, x: np.ndarray) -> np.ndarray:
        if self.result is None:
            raise ScannError.failed_precondition("PCA not trained")
        x = self._check(x)
        return (x - self.result.mean) @ self.result.components.T

    def inverse_project(self, x: np.ndarray) -> Optional[np.ndarray]:
        """Approximate reconstruction (reference: pca.rs:160-184)."""
        if self.result is None:
            return None
        x = np.asarray(x, dtype=np.float32)
        return x @ self.result.components + self.result.mean

    def explained_variance_ratio(self) -> np.ndarray:
        if self.result is None:
            raise ScannError.failed_precondition("PCA not trained")
        return self.result.explained_variance_ratio
