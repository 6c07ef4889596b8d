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


def _fused_numpy_reference(luts_u8, codes, n_valid, r):
    """Integer emulation of the fused sweep: per-block (min value, argmin)."""
    b, s, c = luts_u8.shape
    n = codes.shape[0]
    sums = luts_u8.astype(np.int64)[
        np.arange(b)[:, None, None], np.arange(s)[None, :, None],
        codes.T.astype(int)[None]].sum(axis=1)          # [B, N]
    sums = np.where(np.arange(n)[None, :] < n_valid, sums, 10**9)
    blocks = sums.reshape(b, n // r, r)
    return blocks.min(axis=2), blocks.argmin(axis=2)


@pytest.mark.parametrize("s", [8, 7])  # even and odd subspace counts
def test_lut16_fused_sweep_exact(rng, s):
    from scann_tpu.hashes.lut import luts_i8_evenfirst
    from scann_tpu.hashes.lut16 import pack_codes_4bit
    from scann_tpu.ops.pallas_kernels import (
        INVALID_COMBINED,
        lut16_fused_sweep_pallas,
    )

    b, c, n, r, n_valid = 3, 16, 512, 32, 400
    luts_u8 = rng.integers(0, 256, size=(b, s, c)).astype(np.uint8)
    codes = rng.integers(0, c, size=(n, s)).astype(np.uint8)
    packed_t = jnp.asarray(pack_codes_4bit(codes).T)   # [S_pad/2, N]
    luts_i8 = luts_i8_evenfirst(jnp.asarray(luts_u8))

    comb = np.asarray(lut16_fused_sweep_pallas(
        luts_i8, packed_t, jnp.int32(n_valid), tile_n=128, r=r,
        interpret=True))                                # [N/r, B]
    got = comb.T.astype(np.int64)
    got_val, got_loc = got // r, got % r

    want_val, want_loc = _fused_numpy_reference(luts_u8, codes, n_valid, r)
    # fully-invalid blocks carry the sentinel
    invalid = want_val >= 10**9
    assert np.all(got.astype(np.float64)[invalid] * 0 + comb.T[invalid]
                  >= INVALID_COMBINED / 2)
    np.testing.assert_array_equal(got_val[~invalid], want_val[~invalid])
    # ties may pick a different argmin; assert the picked point achieves it
    sums = luts_u8.astype(np.int64)[
        np.arange(b)[:, None, None], np.arange(s)[None, :, None],
        codes.T.astype(int)[None]].sum(axis=1)
    pick = np.take_along_axis(
        sums.reshape(b, n // r, r), got_loc[:, :, None], axis=2)[:, :, 0]
    np.testing.assert_array_equal(pick[~invalid], want_val[~invalid])
    # boundary block: the masked tail must never win
    assert np.all((got_loc * 0 + np.arange(n // r)[None] * r + got_loc)
                  [~invalid] < n_valid)


def test_ah_search_fused_kernel_matches_exact(rng):
    """Fused pipeline with pre_k = all blocks must return exact top-k
    (quantized approx only orders candidates; exact re-rank decides)."""
    from scann_tpu.hashes.codebook import Codebook, CodebookConfig
    from scann_tpu.hashes.hasher import ah_search_fused_kernel
    from scann_tpu.hashes.lut16 import pack_codes_4bit
    from scann_tpu.ops.distances import DistanceMeasure

    # d_sub=1 makes PQ accurate enough that the one-candidate-per-block
    # selection is dominated by true ordering, not quantization noise
    n, d, b, k = 2048, 16, 4, 10
    db = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    cb = Codebook(CodebookConfig(num_codes=16, num_subspaces=16, seed=1)).train(db)
    codes = cb.encode_dataset(db)
    packed_t = jnp.asarray(pack_codes_4bit(codes).T)
    norms = (db ** 2).sum(1)

    dists, idx = ah_search_fused_kernel(
        cb.centroids_device(), packed_t, jnp.asarray(db), jnp.asarray(norms),
        jnp.int32(n), jnp.asarray(q), pre_k=n // 32, k=k,
        measure=DistanceMeasure.SQUARED_L2, interpret=True)
    idx = np.asarray(idx)

    gt = np.argsort(((q[:, None] - db[None]) ** 2).sum(-1), axis=1)[:, :k]
    recall = np.mean([len(set(a) & set(g)) / k for a, g in zip(idx, gt)])
    # one candidate per 32-block + PQ ordering: high but not perfect recall
    assert recall >= 0.8, recall
    assert np.all(idx >= 0)
    # exact distances for returned candidates
    for bi in range(b):
        want = ((q[bi] - db[idx[bi]]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(dists)[bi], want, rtol=1e-4)


def test_ah_search_fused_kernel_epsilons(rng):
    from scann_tpu.hashes.codebook import Codebook, CodebookConfig
    from scann_tpu.hashes.hasher import ah_search_fused_kernel
    from scann_tpu.hashes.lut16 import pack_codes_4bit
    from scann_tpu.ops.distances import DistanceMeasure

    n, d, b, k = 1024, 16, 3, 8
    db = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    cb = Codebook(CodebookConfig(num_codes=16, num_subspaces=4, seed=1)).train(db)
    packed_t = jnp.asarray(pack_codes_4bit(cb.encode_dataset(db)).T)
    norms = (db ** 2).sum(1)
    args = (cb.centroids_device(), packed_t, jnp.asarray(db),
            jnp.asarray(norms), jnp.int32(n), jnp.asarray(q))
    kw = dict(pre_k=n // 32, k=k, measure=DistanceMeasure.SQUARED_L2,
              interpret=True)

    base_d, base_i = ah_search_fused_kernel(*args, **kw)
    post = float(np.asarray(base_d)[:, k // 2].mean())
    d2, i2 = ah_search_fused_kernel(*args, jnp.inf, jnp.float32(post), **kw)
    d2, i2 = np.asarray(d2), np.asarray(i2)
    assert np.all((d2 <= post) | np.isinf(d2))
    assert np.all((i2 >= 0) | np.isinf(d2))
    assert np.isinf(d2).any()
