"""Stacked (multi-level residual) product quantization
(reference: src/hashes/stacked.rs:58-325).

Each level trains a full PQ codebook on the residuals of the previous
levels; encode subtracts each level's reconstruction before encoding the
next. ``AdditiveQuantizer`` is the single-subspace-per-level variant
(stacked.rs:214-325). Training/encoding reuse the on-device codebook
programs — each level is a batched device encode, the residual loop runs on
host over L levels (L is small).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from scann_tpu.errors import ScannError
from scann_tpu.hashes.codebook import Codebook, CodebookConfig


@dataclasses.dataclass
class StackedQuantizerConfig:
    """(reference: stacked.rs:20-55)."""

    num_levels: int = 2
    num_codes: int = 16
    num_subspaces: int = 8
    max_iterations: int = 25
    seed: Optional[int] = None


class StackedQuantizer:
    """Residual multi-level PQ (reference: stacked.rs:58-211)."""

    def __init__(self, config: Optional[StackedQuantizerConfig] = None):
        self.config = config or StackedQuantizerConfig()
        self.levels: List[Codebook] = []
        self.dimensionality = 0

    @property
    def is_trained(self) -> bool:
        return bool(self.levels)

    def train(self, data) -> "StackedQuantizer":
        arr = data.numpy() if hasattr(data, "numpy") else np.asarray(data, np.float32)
        if arr.shape[0] == 0:
            raise ScannError.invalid_argument("Cannot train on empty dataset")
        cfg = self.config
        self.dimensionality = arr.shape[1]
        seed = cfg.seed if cfg.seed is not None else 42

        residual = arr.astype(np.float32).copy()
        self.levels = []
        for lvl in range(cfg.num_levels):
            cb = Codebook(CodebookConfig(
                num_codes=cfg.num_codes,
                num_subspaces=cfg.num_subspaces,
                max_iterations=cfg.max_iterations,
                seed=seed + 1000 * lvl,
            )).train(residual)
            codes = cb.encode_dataset(residual)
            residual = residual - cb.decode(codes)
            self.levels.append(cb)
        return self

    def encode(self, points: np.ndarray) -> np.ndarray:
        """[.., D] -> [.., L, S] uint8 codes."""
        self._check_trained()
        x = np.asarray(points, dtype=np.float32)
        single = x.ndim == 1
        if single:
            x = x[None, :]
        residual = x.copy()
        out = np.zeros((x.shape[0], len(self.levels), self.config.num_subspaces),
                       dtype=np.uint8)
        for li, cb in enumerate(self.levels):
            codes = cb.encode_dataset(residual)
            out[:, li, :] = codes
            residual = residual - cb.decode(codes)
        return out[0] if single else out

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """[.., L, S] codes -> [.., D] reconstruction (sum of levels)."""
        self._check_trained()
        codes = np.asarray(codes)
        single = codes.ndim == 2
        if single:
            codes = codes[None, ...]
        out = np.zeros((codes.shape[0], self.dimensionality), dtype=np.float32)
        for li, cb in enumerate(self.levels):
            out += cb.decode(codes[:, li, :])
        return out[0] if single else out

    def reconstruction_error(self, data: np.ndarray) -> float:
        arr = np.asarray(data, np.float32)
        rec = self.decode(self.encode(arr))
        return float(((arr - rec) ** 2).sum(-1).mean())

    def _check_trained(self):
        if not self.levels:
            raise ScannError.failed_precondition("quantizer not trained")


class AdditiveQuantizer(StackedQuantizer):
    """One subspace per level (reference: stacked.rs:214-325)."""

    def __init__(self, num_levels: int = 4, num_codes: int = 256,
                 max_iterations: int = 25, seed: Optional[int] = None):
        super().__init__(StackedQuantizerConfig(
            num_levels=num_levels, num_codes=num_codes, num_subspaces=1,
            max_iterations=max_iterations, seed=seed))
