"""Projection base interface + identity + factory
(reference: src/projection/mod.rs:26-193)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from scann_tpu.errors import ScannError


class Projection:
    """(reference: mod.rs:26-56). ``project`` is batched: [.., D_in] -> [.., D_out]."""

    @property
    def input_dim(self) -> int:
        raise NotImplementedError

    @property
    def output_dim(self) -> int:
        raise NotImplementedError

    def project(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def inverse_project(self, x: np.ndarray) -> Optional[np.ndarray]:
        return None

    @property
    def is_trainable(self) -> bool:
        return False

    def _check(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32)
        if x.shape[-1] != self.input_dim:
            raise ScannError.invalid_argument(
                f"input dim {x.shape[-1]} != projection input {self.input_dim}")
        return x


class IdentityProjection(Projection):
    """(reference: mod.rs:59-96)."""

    def __init__(self, dim: int):
        self._dim = int(dim)

    @property
    def input_dim(self) -> int:
        return self._dim

    @property
    def output_dim(self) -> int:
        return self._dim

    def project(self, x: np.ndarray) -> np.ndarray:
        return self._check(x)

    def inverse_project(self, x: np.ndarray) -> Optional[np.ndarray]:
        return np.asarray(x, dtype=np.float32)


class ProjectionFactory:
    """String-keyed factory (the reference's ProjectionType enum dispatch,
    mod.rs:98-193)."""

    @staticmethod
    def create(kind: str, **kwargs) -> Projection:
        from scann_tpu.projection.chunking import ChunkingConfig, ChunkingProjection
        from scann_tpu.projection.opq import OpqConfig, OpqProjection
        from scann_tpu.projection.pca import PcaProjection
        from scann_tpu.projection.random import (
            RandomGaussianProjection,
            RandomOrthogonalProjection,
        )
        from scann_tpu.projection.truncate import TruncateProjection

        kind = kind.lower()
        if kind == "identity":
            return IdentityProjection(kwargs["dim"])
        if kind == "pca":
            return PcaProjection(kwargs["input_dim"], kwargs["output_dim"])
        if kind == "random_orthogonal":
            return RandomOrthogonalProjection(
                kwargs["input_dim"], kwargs.get("output_dim"), kwargs.get("seed", 42))
        if kind == "random_gaussian":
            return RandomGaussianProjection(
                kwargs["input_dim"], kwargs["output_dim"], kwargs.get("seed", 42))
        if kind == "opq":
            return OpqProjection(OpqConfig(
                dim=kwargs["dim"], num_subspaces=kwargs.get("num_subspaces", 8),
                num_iterations=kwargs.get("num_iterations", 10),
                seed=kwargs.get("seed", 42)))
        if kind == "truncate":
            return TruncateProjection(kwargs["input_dim"], kwargs["output_dim"],
                                      kwargs.get("offset", 0))
        if kind == "chunking":
            return ChunkingProjection(ChunkingConfig(
                input_dim=kwargs["input_dim"], num_chunks=kwargs["num_chunks"]))
        raise ScannError.invalid_argument(f"unknown projection kind {kind!r}")
