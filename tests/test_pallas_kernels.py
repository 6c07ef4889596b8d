"""Pallas kernels vs jnp reference in interpret mode — the TPU analog of
the reference's AVX2-vs-portable differential tests
(reference: src/hashes/lut16_simd.rs:377-411,
src/distance_measures/one_to_many_asymmetric.rs:489-543)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scann_tpu.ops.pallas_kernels import int8_dots_pallas, lut16_score_pallas


def test_lut16_pallas_matches_reference(rng):
    b, s, c, n = 4, 8, 16, 256
    luts = rng.uniform(0, 4, size=(b, s, c)).astype(np.float32)
    codes = rng.integers(0, c, size=(n, s)).astype(np.uint8)
    got = np.asarray(lut16_score_pallas(
        jnp.asarray(luts), jnp.asarray(codes.T), tile_n=128, interpret=True))
    want = luts[:, np.arange(s)[None, :], codes.astype(int)].sum(-1)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_lut16_pallas_single_tile(rng):
    b, s, c, n = 2, 4, 16, 128
    luts = rng.uniform(0, 2, size=(b, s, c)).astype(np.float32)
    codes = rng.integers(0, c, size=(n, s)).astype(np.uint8)
    got = np.asarray(lut16_score_pallas(
        jnp.asarray(luts), jnp.asarray(codes.T), tile_n=128, interpret=True))
    want = luts[:, np.arange(s)[None, :], codes.astype(int)].sum(-1)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_int8_dots_pallas_matches_reference(rng):
    b, d, n = 3, 32, 256
    q = rng.normal(size=(b, d)).astype(np.float32)
    codes = rng.integers(0, 256, size=(n, d)).astype(np.uint8)
    got = np.asarray(int8_dots_pallas(
        jnp.asarray(q), jnp.asarray(codes.T), tile_n=128, interpret=True))
    want = q @ codes.astype(np.float32).T
    # bf16 conversion of the query loses ~3 decimal digits
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1.0)


def test_int8_dots_affine_trick(rng):
    """Full asymmetric squared-L2 via the pallas dots + affine fold must
    match dequantized-matmul scoring."""
    from scann_tpu.quantization.scalar import QuantizedDataset, ScalarQuantizer
    from scann_tpu.data.dataset import DenseDataset

    db = rng.normal(size=(128, 16)).astype(np.float32)
    qd = QuantizedDataset.from_dataset(DenseDataset(db))
    scale = qd.quantizer.scale
    offset = qd.quantizer.min_value
    codes, norms, n = qd.device()
    q = rng.normal(size=(2, 16)).astype(np.float32)

    raw = np.asarray(int8_dots_pallas(
        jnp.asarray(q), jnp.asarray(np.asarray(codes).T), tile_n=128, interpret=True))
    dots = scale * raw + offset * q.sum(1, keepdims=True)
    d_got = (q ** 2).sum(1, keepdims=True) + np.asarray(norms)[None, :n] - 2 * dots[:, :n]

    deq = qd.dequantize_all()
    d_want = ((q[:, None, :] - deq[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d_got, d_want, rtol=1e-2, atol=0.05)
