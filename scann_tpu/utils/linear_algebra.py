"""Linear-algebra training math on device.

Replaces the reference's nalgebra host code
(reference: src/utils/linear_algebra.rs): SVD-based PCA (:84-121),
QR-derived random orthogonal matrices (:146-170), symmetric
eigendecomposition (:228-260) — all via jnp.linalg on the accelerator.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu.errors import ScannError


@dataclasses.dataclass
class PcaResult:
    """(reference: linear_algebra.rs:64-82)."""

    components: np.ndarray          # [out_dim, D] principal axes (rows)
    mean: np.ndarray                # [D]
    explained_variance: np.ndarray  # [out_dim]
    explained_variance_ratio: np.ndarray


@jax.jit
def _pca_device(data: jnp.ndarray):
    mean = jnp.mean(data, axis=0)
    centered = data - mean[None, :]
    # economy SVD of the centered data: principal axes = V^T rows
    _, s, vt = jnp.linalg.svd(centered, full_matrices=False)
    n = data.shape[0]
    var = (s * s) / jnp.maximum(n - 1, 1)
    return mean, vt, var


def fit_pca(data: np.ndarray, out_dim: int) -> PcaResult:
    """(reference: linear_algebra.rs:84-121)."""
    data = np.asarray(data, dtype=np.float32)
    n, d = data.shape
    if out_dim <= 0 or out_dim > d:
        raise ScannError.invalid_argument(f"out_dim {out_dim} not in [1, {d}]")
    if n < 2:
        raise ScannError.invalid_argument("PCA needs at least 2 samples")
    mean, vt, var = jax.tree.map(np.asarray, _pca_device(jnp.asarray(data)))
    total = float(var.sum())
    return PcaResult(
        components=vt[:out_dim],
        mean=mean,
        explained_variance=var[:out_dim],
        explained_variance_ratio=var[:out_dim] / max(total, 1e-30),
    )


def random_orthogonal_matrix(dim: int, seed: int = 42) -> np.ndarray:
    """QR of a Gaussian matrix, sign-fixed (reference: linear_algebra.rs:146-170)."""
    key = jax.random.PRNGKey(seed)
    g = jax.random.normal(key, (dim, dim), dtype=jnp.float32)
    q, r = jnp.linalg.qr(g)
    # fix signs so the decomposition is unique (diag(r) > 0)
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    return np.asarray(q)


def symmetric_eigen(mat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Eigendecomposition of a symmetric matrix, eigenvalues descending
    (reference: linear_algebra.rs:228-260).

    Returns (eigenvalues [D], eigenvectors [D, D] columns)."""
    mat = np.asarray(mat, dtype=np.float32)
    if mat.ndim != 2 or mat.shape[0] != mat.shape[1]:
        raise ScannError.invalid_argument("matrix must be square")
    w, v = np.linalg.eigh(mat.astype(np.float64))
    order = np.argsort(w)[::-1]
    return w[order].astype(np.float32), v[:, order].astype(np.float32)


def gram_schmidt(vectors: np.ndarray) -> np.ndarray:
    """Orthonormalize rows (reference: linear_algebra.rs:173-208)."""
    v = np.asarray(vectors, dtype=np.float64).copy()
    out = []
    for row in v:
        for u in out:
            row = row - np.dot(row, u) * u
        norm = np.linalg.norm(row)
        if norm > 1e-10:
            out.append(row / norm)
    return np.asarray(out, dtype=np.float32)
