"""Quantization codecs and quantized search.

Covers: int8 codec byte semantics (u8-as-i8 quirk), calibration modes,
int4, bf16/fp8 round-trips, quantized-vs-float result agreement
(reference test analogs: src/quantization/scalar.rs tests,
src/brute_force/scalar_quantized.rs:486-513).
"""

import numpy as np
import pytest

from scann_tpu import BruteForceSearcher, DenseDataset, DistanceMeasure
from scann_tpu.models.scalar_quantized import (
    ScalarQuantizedBruteForceSearcher,
    ScalarQuantizedConfig,
)
from scann_tpu.quantization import (
    BFloat16Dataset,
    Fp8Format,
    Fp8Quantizer,
    QuantizationStats,
    QuantizedDataset,
    ScalarQuantizer,
    ScalarQuantizerConfig,
)


def test_stats(rng):
    x = rng.normal(loc=2.0, scale=3.0, size=(100, 50)).astype(np.float32)
    s = QuantizationStats.from_array(x)
    assert s.min_value == pytest.approx(float(x.min()))
    assert s.max_value == pytest.approx(float(x.max()))
    assert s.mean == pytest.approx(float(x.mean()), rel=1e-5)
    assert s.std_dev == pytest.approx(float(x.std(ddof=1)), rel=1e-4)


def test_int8_codec_round_trip_error():
    q = ScalarQuantizer(ScalarQuantizerConfig().with_range(-1.0, 1.0)).calibrate(
        QuantizationStats()
    )
    vals = np.linspace(-1, 1, 101).astype(np.float32)
    codes = q.quantize(vals)
    assert codes.dtype == np.uint8
    back = q.dequantize(codes)
    # max error is half a step
    assert np.abs(back - vals).max() <= q.scale / 2 + 1e-6


def test_u8_as_i8_quirk():
    """Bytes >127 wrap negative as i8 but must dequantize via the u8 value
    (reference: src/quantization/scalar.rs:168-172)."""
    q = ScalarQuantizer(ScalarQuantizerConfig().with_range(0.0, 255.0)).calibrate(
        QuantizationStats()
    )
    assert q.quantize_value(200.0) == 200
    code_i8 = np.array([200], dtype=np.uint8).view(np.int8)  # = -56
    assert int(code_i8[0]) == -56
    assert q.dequantize(code_i8)[0] == pytest.approx(200.0)
    assert q.dequantize_value(-56) == pytest.approx(200.0)


def test_calibration_symmetric_and_stddev(rng):
    x = rng.normal(size=(50, 20)).astype(np.float32)
    sym = ScalarQuantizer(ScalarQuantizerConfig(symmetric=True)).calibrate_from_array(x)
    assert sym.min_value == pytest.approx(-sym.max_value)
    clip = ScalarQuantizer(ScalarQuantizerConfig(num_std_devs=1.0)).calibrate_from_array(x)
    stats = QuantizationStats.from_array(x)
    assert clip.max_value <= stats.mean + stats.std_dev + 1e-5
    assert clip.min_value >= stats.mean - stats.std_dev - 1e-5


def test_int4_levels():
    q = ScalarQuantizer(ScalarQuantizerConfig(bits=4).with_range(0.0, 15.0)).calibrate(
        QuantizationStats()
    )
    assert q.num_levels == 15
    codes = q.quantize(np.array([0.0, 7.4, 15.0, 99.0], dtype=np.float32))
    assert codes.tolist() == [0, 7, 15, 15]


def test_quantized_dataset(rng):
    data = rng.normal(size=(30, 8)).astype(np.float32)
    # wide clip range -> no outlier clamping, so error <= half a step
    qd = QuantizedDataset.from_dataset(
        DenseDataset(data), ScalarQuantizer(ScalarQuantizerConfig(num_std_devs=100.0))
    )
    assert qd.size == 30 and qd.dimensionality == 8
    assert qd.raw_data_i8().dtype == np.int8
    err = np.abs(qd.dequantize_all() - data).max()
    assert err <= qd.quantizer.scale / 2 + 1e-6
    codes_dev, norms, n = qd.device()
    assert n == 30 and codes_dev.dtype == np.uint8
    want_norm = (qd.dequantize_all() ** 2).sum(1)
    np.testing.assert_allclose(np.asarray(norms)[:30], want_norm, rtol=1e-4)


def test_quantized_search_agrees_with_float(rng):
    """int8 search recall@10 vs exact float search >= 0.9 on gaussian data
    (reference: scalar_quantized.rs:486-513 checks result agreement)."""
    db = rng.normal(size=(2000, 32)).astype(np.float32)
    q = rng.normal(size=(20, 32)).astype(np.float32)
    exact = BruteForceSearcher(DenseDataset(db))
    gt_idx, _ = exact.search_batched_arrays(q, 10)
    quant = ScalarQuantizedBruteForceSearcher(DenseDataset(db))
    idx, dist = quant.search_batched_arrays(q, 10)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, gt_idx)])
    assert recall >= 0.9
    assert (np.diff(dist, axis=1) >= -1e-5).all()


@pytest.mark.parametrize("storage", ["bf16", "fp8_e4m3", "int4"])
def test_other_storages_search(rng, storage):
    db = rng.normal(size=(500, 16)).astype(np.float32)
    q = db[:5] + rng.normal(size=(5, 16)).astype(np.float32) * 0.01
    s = ScalarQuantizedBruteForceSearcher(
        DenseDataset(db), ScalarQuantizedConfig(storage=storage)
    )
    idx, _ = s.search_batched_arrays(q, 1)
    # perturbed queries still find their source row
    hits = (idx[:, 0] == np.arange(5)).mean()
    assert hits >= 0.8


def test_dot_product_quantized(rng):
    db = rng.normal(size=(300, 16)).astype(np.float32)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    s = ScalarQuantizedBruteForceSearcher(
        DenseDataset(db),
        ScalarQuantizedConfig(distance_measure=DistanceMeasure.DOT_PRODUCT),
    )
    idx, dist = s.search_batched_arrays(q, 5)
    deq = s.quantized_dataset.dequantize_all()
    want = -(q @ deq.T)
    got_at = np.take_along_axis(want, idx, axis=1)
    np.testing.assert_allclose(dist, got_at, rtol=1e-3, atol=1e-3)


def test_bf16_round_trip(rng):
    x = rng.normal(size=(10, 4)).astype(np.float32)
    ds = BFloat16Dataset.from_f32(x)
    assert ds.compression_ratio() == 2.0
    assert np.abs(ds.to_f32() - x).max() < 0.01 * np.abs(x).max() + 1e-3


def test_fp8_codec():
    q = Fp8Quantizer(Fp8Format.E4M3)
    for v in [0.0, 1.0, -1.5, 0.125, 448.0]:
        bits = q.encode_bits(v)
        assert 0 <= bits <= 255
        assert q.decode_bits(bits) == pytest.approx(v, rel=0.07, abs=1e-3)
    # overflow saturates near max for e4m3fn
    assert abs(q.decode_bits(q.encode_bits(10000.0))) >= 400.0


def test_memory_usage(rng):
    db = rng.normal(size=(100, 32)).astype(np.float32)
    s = ScalarQuantizedBruteForceSearcher(DenseDataset(db))
    assert s.compression_ratio() == pytest.approx(4.0)
    assert s.memory_usage() == 100 * 32 + 4 * 100
