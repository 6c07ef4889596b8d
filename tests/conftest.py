"""Test environment: force the CPU backend with 8 virtual devices so sharding
tests exercise a real (virtual) mesh without TPU hardware.

The container's sitecustomize registers the axon TPU plugin and initializes
JAX backends before pytest starts, so env vars alone are too late — we
update jax's config and clear the already-created backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# CPU AOT cache entries are machine-feature-specific; don't persist them
os.environ.setdefault("SCANN_TPU_COMPILE_CACHE", "0")

import jax
from jax._src import xla_bridge

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
xla_bridge._clear_backends()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_clustered_data(rng, n=512, d=32, n_clusters=8, spread=0.1):
    """Deterministic clustered synthetic data (the reference's fixture style:
    seeded generators, reference: src/trees/kmeans.rs:434-519)."""
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 5.0
    assign = rng.integers(0, n_clusters, size=n)
    pts = centers[assign] + rng.normal(size=(n, d)).astype(np.float32) * spread
    return pts.astype(np.float32), centers, assign


@pytest.fixture
def clustered_data(rng):
    return make_clustered_data(rng)
