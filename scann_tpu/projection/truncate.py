"""Truncation / windowed projection (reference: src/projection/truncate.rs:10-120)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from scann_tpu.errors import ScannError
from scann_tpu.projection.base import Projection


class TruncateProjection(Projection):
    """Keep dims [offset, offset+output_dim)."""

    def __init__(self, input_dim: int, output_dim: int, offset: int = 0):
        if offset < 0 or output_dim <= 0:
            raise ScannError.invalid_argument(
                "truncation window must have offset >= 0 and output_dim > 0")
        if offset + output_dim > input_dim:
            raise ScannError.invalid_argument("truncation window exceeds input dim")
        self._in = int(input_dim)
        self._out = int(output_dim)
        self.offset = int(offset)

    @property
    def input_dim(self) -> int:
        return self._in

    @property
    def output_dim(self) -> int:
        return self._out

    def project(self, x: np.ndarray) -> np.ndarray:
        return self._check(x)[..., self.offset : self.offset + self._out]

    def inverse_project(self, x: np.ndarray) -> Optional[np.ndarray]:
        """Zero-pad back to input_dim (reference: truncate.rs:56-70)."""
        x = np.asarray(x, dtype=np.float32)
        out = np.zeros(x.shape[:-1] + (self._in,), dtype=np.float32)
        out[..., self.offset : self.offset + self._out] = x
        return out
