"""Gaussian mixture model via EM (reference: src/utils/gmm.rs:12-601).

Covariance types: full / diagonal / spherical. E-step and M-step are
vectorized numpy (datasets used for GMM training here are modest); predict
and scoring use log-sum-exp responsibilities. BIC/AIC for model selection.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import numpy as np

from scann_tpu.errors import ScannError


class CovarianceType(enum.Enum):
    FULL = "Full"
    DIAGONAL = "Diagonal"
    SPHERICAL = "Spherical"


@dataclasses.dataclass
class GmmConfig:
    """(reference: gmm.rs:12-51)."""

    num_components: int = 2
    covariance_type: CovarianceType = CovarianceType.DIAGONAL
    max_iterations: int = 100
    convergence_threshold: float = 1e-4
    reg_covar: float = 1e-6
    seed: Optional[int] = None


class GaussianMixture:
    """(reference: gmm.rs:100-601)."""

    def __init__(self, config: Optional[GmmConfig] = None):
        self.config = config or GmmConfig()
        self.weights: Optional[np.ndarray] = None       # [K]
        self.means: Optional[np.ndarray] = None         # [K, D]
        self.covariances: Optional[np.ndarray] = None   # [K,D,D] | [K,D] | [K]
        self.converged = False
        self.num_iterations = 0
        self._log_likelihood = -np.inf

    # -- log density -------------------------------------------------------
    def _log_prob(self, x: np.ndarray) -> np.ndarray:
        """[N, K] per-component log densities."""
        k, d = self.means.shape
        n = x.shape[0]
        out = np.empty((n, k))
        ct = self.config.covariance_type
        for j in range(k):
            diff = x - self.means[j]
            if ct == CovarianceType.FULL:
                cov = self.covariances[j]
                sign, logdet = np.linalg.slogdet(cov)
                sol = np.linalg.solve(cov, diff.T).T
                maha = np.einsum("nd,nd->n", diff, sol)
            elif ct == CovarianceType.DIAGONAL:
                var = self.covariances[j]
                logdet = np.log(var).sum()
                maha = (diff * diff / var).sum(-1)
            else:
                var = self.covariances[j]
                logdet = d * np.log(var)
                maha = (diff * diff).sum(-1) / var
            out[:, j] = -0.5 * (d * np.log(2 * np.pi) + logdet + maha)
        return out

    def _estimate_log_resp(self, x: np.ndarray) -> Tuple[np.ndarray, float]:
        wlp = self._log_prob(x) + np.log(self.weights)[None, :]
        norm = np.logaddexp.reduce(wlp, axis=1)
        return wlp - norm[:, None], float(norm.mean())

    # -- fit ----------------------------------------------------------------
    def fit(self, data) -> "GaussianMixture":
        x = data.numpy() if hasattr(data, "numpy") else np.asarray(data, np.float64)
        x = np.asarray(x, dtype=np.float64)
        n, d = x.shape
        cfg = self.config
        k = cfg.num_components
        if n < k:
            raise ScannError.invalid_argument("fewer points than components")

        rng = np.random.default_rng(cfg.seed)
        self.weights = np.full(k, 1.0 / k)
        self.means = x[rng.choice(n, k, replace=False)].copy()
        gvar = x.var(axis=0) + cfg.reg_covar
        if cfg.covariance_type == CovarianceType.FULL:
            self.covariances = np.stack([np.diag(gvar)] * k)
        elif cfg.covariance_type == CovarianceType.DIAGONAL:
            self.covariances = np.stack([gvar] * k)
        else:
            self.covariances = np.full(k, float(gvar.mean()))

        prev_ll = -np.inf
        self.converged = False
        for it in range(cfg.max_iterations):
            self.num_iterations = it + 1
            log_resp, ll = self._estimate_log_resp(x)
            resp = np.exp(log_resp)
            nk = resp.sum(axis=0) + 1e-10
            self.weights = nk / n
            self.means = (resp.T @ x) / nk[:, None]
            if cfg.covariance_type == CovarianceType.FULL:
                covs = []
                for j in range(k):
                    diff = x - self.means[j]
                    cov = (resp[:, j : j + 1] * diff).T @ diff / nk[j]
                    covs.append(cov + np.eye(d) * cfg.reg_covar)
                self.covariances = np.stack(covs)
            elif cfg.covariance_type == CovarianceType.DIAGONAL:
                covs = []
                for j in range(k):
                    diff = x - self.means[j]
                    covs.append((resp[:, j] @ (diff * diff)) / nk[j] + cfg.reg_covar)
                self.covariances = np.stack(covs)
            else:
                covs = []
                for j in range(k):
                    diff = x - self.means[j]
                    covs.append(float((resp[:, j] @ (diff * diff).sum(-1))
                                      / (nk[j] * d)) + cfg.reg_covar)
                self.covariances = np.asarray(covs)

            self._log_likelihood = ll
            if abs(ll - prev_ll) < cfg.convergence_threshold:
                self.converged = True
                break
            prev_ll = ll
        return self

    # -- inference ----------------------------------------------------------
    def predict(self, x: np.ndarray) -> np.ndarray:
        self._check()
        lr, _ = self._estimate_log_resp(np.asarray(x, np.float64))
        return lr.argmax(axis=1).astype(np.int32)

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        self._check()
        lr, _ = self._estimate_log_resp(np.asarray(x, np.float64))
        return np.exp(lr)

    def score(self, x: np.ndarray) -> float:
        """Mean log-likelihood."""
        self._check()
        _, ll = self._estimate_log_resp(np.asarray(x, np.float64))
        return ll

    def sample(self, n: int, seed: Optional[int] = None) -> np.ndarray:
        """(reference: gmm.rs:470-519)."""
        self._check()
        rng = np.random.default_rng(seed)
        k, d = self.means.shape
        comp = rng.choice(k, size=n, p=self.weights / self.weights.sum())
        out = np.empty((n, d))
        ct = self.config.covariance_type
        for j in range(k):
            m = comp == j
            if not m.any():
                continue
            if ct == CovarianceType.FULL:
                out[m] = rng.multivariate_normal(self.means[j], self.covariances[j],
                                                 size=int(m.sum()))
            elif ct == CovarianceType.DIAGONAL:
                out[m] = self.means[j] + rng.normal(size=(int(m.sum()), d)) * np.sqrt(
                    self.covariances[j])
            else:
                out[m] = self.means[j] + rng.normal(size=(int(m.sum()), d)) * np.sqrt(
                    self.covariances[j])
        return out.astype(np.float32)

    def _n_parameters(self) -> int:
        k, d = self.means.shape
        if self.config.covariance_type == CovarianceType.FULL:
            cov = k * d * (d + 1) // 2
        elif self.config.covariance_type == CovarianceType.DIAGONAL:
            cov = k * d
        else:
            cov = k
        return int(k - 1 + k * d + cov)

    def bic(self, x: np.ndarray) -> float:
        """(reference: gmm.rs:540-560)."""
        x = np.asarray(x, np.float64)
        return -2.0 * self.score(x) * len(x) + self._n_parameters() * np.log(len(x))

    def aic(self, x: np.ndarray) -> float:
        x = np.asarray(x, np.float64)
        return -2.0 * self.score(x) * len(x) + 2.0 * self._n_parameters()

    def _check(self):
        if self.means is None:
            raise ScannError.failed_precondition("GMM not fitted")
