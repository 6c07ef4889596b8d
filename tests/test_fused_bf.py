"""Fused VMEM-resident brute-force kernel vs oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from scann_tpu.ops.fused_bf_pallas import fused_bf_search_pallas


def test_fused_bf_matches_oracle(rng):
    db = rng.normal(size=(256, 32)).astype(np.float32)
    q = rng.normal(size=(8, 32)).astype(np.float32)
    norms = (db ** 2).sum(1)[None, :].astype(np.float32)
    vals, idx = fused_bf_search_pallas(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(norms),
        jnp.asarray([256], jnp.int32), k=5, interpret=True)
    vals, idx = np.asarray(vals), np.asarray(idx)
    d = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)[:, :5]
    np.testing.assert_allclose(vals, np.take_along_axis(d, order, 1), rtol=1e-3, atol=1e-3)
    d_at = np.take_along_axis(d, idx, 1)
    np.testing.assert_allclose(d_at, np.take_along_axis(d, order, 1), rtol=1e-3, atol=1e-3)


def test_fused_bf_masks_padding(rng):
    db = rng.normal(size=(64, 8)).astype(np.float32)
    db[50:] = 0  # padding rows
    q = np.zeros((8, 8), np.float32)  # queries at the pad location
    norms = (db ** 2).sum(1)[None, :].astype(np.float32)
    vals, idx = fused_bf_search_pallas(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(norms),
        jnp.asarray([50], jnp.int32), k=3, interpret=True)
    assert (np.asarray(idx) < 50).all()


def test_fused_bf_k_exceeds_valid(rng):
    db = rng.normal(size=(16, 4)).astype(np.float32)
    q = rng.normal(size=(8, 4)).astype(np.float32)
    norms = (db ** 2).sum(1)[None, :].astype(np.float32)
    vals, idx = fused_bf_search_pallas(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(norms),
        jnp.asarray([2], jnp.int32), k=5, interpret=True)
    assert (np.asarray(idx)[:, 2:] == -1).all()
    assert np.isinf(np.asarray(vals)[:, 2:]).all()
