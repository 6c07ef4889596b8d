"""Byte- and behavior-parity fixtures ported from the reference
implementation's own test suite, asserted against this framework on
IDENTICAL inputs.

Every fixture below is a deterministic input/expected pair lifted from the
reference's inline tests (cited per test). Where this framework deliberately
diverges — the reference's SIMD path dequantizes the u8-as-i8 codec bytes as
*signed* values (reference: src/distance_measures/one_to_many_asymmetric.rs:
53-74) while its scalar codec stores unsigned-biased bytes — the divergence
is pinned by a test that models the reference behavior in numpy and proves
this framework's recall on identical bytes is >= the reference's.
"""

import numpy as np
import pytest

from scann_tpu.data.dataset import DenseDataset
from scann_tpu.hashes.codebook import Codebook, CodebookConfig
from scann_tpu.hashes.lut import LookupTable
from scann_tpu.hashes.lut16 import (
    PackedCodes4Bit,
    Lut16SimdTables,
    pack_codes_4bit,
    unpack_codes_4bit,
)
from scann_tpu.quantization.scalar import (
    QuantizedDataset,
    ScalarQuantizer,
    ScalarQuantizerConfig,
)
from scann_tpu.quantization.stats import QuantizationStats


# ---------------------------------------------------------------------------
# LUT16 packed codes (reference: src/hashes/lut16.rs:313-328 test_packed_codes)
# ---------------------------------------------------------------------------

def test_packed_codes_reference_fixture():
    codes = np.array([[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]], np.uint8)
    packed = PackedCodes4Bit.from_codes(codes)
    assert packed.num_datapoints == 3
    for i in range(3):
        np.testing.assert_array_equal(packed.get_codes(i), codes[i])
    # byte-level layout parity: low nibble first
    # (reference: src/hashes/lut16.rs:43-61 pack loop — code[2j] in the low
    # nibble, code[2j+1] in the high nibble)
    expected_bytes = np.array(
        [[0x10, 0x32], [0x54, 0x76], [0x98, 0xBA]], np.uint8)
    np.testing.assert_array_equal(pack_codes_4bit(codes), expected_bytes)
    np.testing.assert_array_equal(
        unpack_codes_4bit(expected_bytes, 4), codes)


# ---------------------------------------------------------------------------
# LUT16 lookup tables (reference: src/hashes/lut16.rs:330-366
# test_lut16_table / test_lookup_tables)
# ---------------------------------------------------------------------------

def test_lut16_table_lookup_semantics():
    # Lut16Table::from_distances(|code| code as f32 * 0.5):
    # lookup(0)=0, lookup(1)=0.5, lookup(10)=5.0
    table = LookupTable(np.arange(16, dtype=np.float32)[None, :] * 0.5)
    assert table.compute_distance([0]) == 0.0
    assert table.compute_distance([1]) == 0.5
    assert table.compute_distance([10]) == 5.0


def test_lookup_tables_reference_fixture():
    # 2 subspaces of 2 dims; subspace 0 centroid i = [i, 0], subspace 1
    # centroid i = [0, i]; query [5, 0, 0, 5] matches centroid 5 in both.
    centroids = np.zeros((2, 16, 2), np.float32)
    centroids[0, :, 0] = np.arange(16)
    centroids[1, :, 1] = np.arange(16)
    cb = Codebook(CodebookConfig(num_codes=16, num_subspaces=2))
    cb.centroids = centroids
    cb.dimensionality = 4
    cb.dims_per_subspace = 2
    query = np.array([5.0, 0.0, 0.0, 5.0], np.float32)
    tables = LookupTable.from_query(cb, query)
    assert tables.num_subspaces == 2
    # code [5, 5] -> ~0; code [0, 0] -> 25 + 25 = 50
    assert abs(tables.compute_distance([5, 5])) < 0.01
    assert abs(tables.compute_distance([0, 0]) - 50.0) < 0.01


def test_lut16_simd_u8_tables_roundtrip():
    # The u8 bias/multiplier table codec (reference: src/hashes/
    # lut16_simd.rs:39-141) must preserve distance ordering and approximate
    # values on the reference's own [S=2, C=16] fixture above.
    rng = np.random.default_rng(7)
    tables = rng.uniform(0.0, 50.0, size=(4, 16)).astype(np.float32)
    simd = Lut16SimdTables.from_float_tables(tables)
    codes = rng.integers(0, 16, size=(32, 4)).astype(np.uint8)
    packed = pack_codes_4bit(codes)
    got = simd.compute_distances_batch(packed)
    want = tables[np.arange(4)[None, :], codes].sum(axis=1)
    step = (tables.max() - tables.min()) / 255.0
    np.testing.assert_allclose(got, want, atol=4 * step * 4)


# ---------------------------------------------------------------------------
# Int4 packing (reference: src/quantization/scalar.rs:346-399 Int4PackedData,
# fixture from test_int4_packing at scalar.rs:456-469)
# ---------------------------------------------------------------------------

def test_int4_packing_reference_fixture():
    values = np.array([-7, 3, 0, 7, -8, 5], np.int8)
    # the reference stores value+8 in a nibble, low nibble first
    # (scalar.rs:353-365), and get() returns nibble-8 (scalar.rs:388)
    biased = (values.astype(np.int16) + 8).astype(np.uint8)[None, :]
    packed = pack_codes_4bit(biased)
    # byte-level parity with the reference layout
    expected = np.array([(1) | (11 << 4), (8) | (15 << 4), (0) | (13 << 4)],
                        np.uint8)
    np.testing.assert_array_equal(packed[0], expected)
    unpacked = unpack_codes_4bit(packed, 6).astype(np.int16) - 8
    np.testing.assert_array_equal(unpacked[0], values)


# ---------------------------------------------------------------------------
# Scalar quantizer codec (reference: src/quantization/scalar.rs:411-454)
# ---------------------------------------------------------------------------

def test_scalar_quantizer_basic_reference_fixture():
    # stats fixture from test_scalar_quantizer_basic (scalar.rs:412-431)
    q = ScalarQuantizer(ScalarQuantizerConfig())
    q.calibrate(QuantizationStats(min_value=-1.0, max_value=1.0,
                                  mean=0.0, std_dev=0.5))
    # range = mean +/- 3*std clipped to [-1, 1] -> [-1, 1]; scale = 2/255
    assert q.min_value == -1.0 and q.max_value == 1.0
    code = q.quantize_value(0.5)
    # byte parity: round((0.5 - (-1)) * 255/2) = round(191.25) = 191
    assert code == 191
    assert abs(q.dequantize_value(code) - 0.5) < 0.02


def test_quantized_dataset_reference_fixture():
    # fixture from test_quantized_dataset (scalar.rs:434-454)
    data = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [-1.0, 0.0, 1.0]],
                    np.float32)
    qd = QuantizedDataset.from_dataset(
        DenseDataset(data), ScalarQuantizer(ScalarQuantizerConfig()))
    assert qd.size == 3
    assert qd.dimensionality == 3
    dq = qd.dequantize_row(1)
    assert abs(dq[0] - 4.0) < 1.0
    assert abs(dq[1] - 5.0) < 1.0
    assert abs(dq[2] - 6.0) < 1.0


def test_precomputed_query_reference_fixture():
    # fixture from test_precomputed_query (scalar.rs:471-490)
    from scann_tpu.quantization.scalar import PrecomputedQuery

    q = ScalarQuantizer(ScalarQuantizerConfig())
    q.calibrate(QuantizationStats(min_value=0.0, max_value=10.0,
                                  mean=5.0, std_dev=2.0))
    query = np.array([1.0, 2.0, 3.0], np.float32)
    pre = PrecomputedQuery(query, q)
    codes = q.quantize(query)
    assert pre.squared_l2_to_codes(codes) < 0.5


# ---------------------------------------------------------------------------
# The deliberate divergence: u8-as-i8 dequantization
# ---------------------------------------------------------------------------

def _reference_signed_dot_distances(query, i8_bytes, inv_multiplier):
    """Numpy model of the reference's AVX2/portable int8 dot-product scoring
    (reference: src/distance_measures/one_to_many_asymmetric.rs:53-76): the
    codec's bytes are read as SIGNED i8 and scaled, even though the codec
    wrote unsigned-biased bytes (scalar.rs:162-171). Returns -dot."""
    signed = i8_bytes.astype(np.int8).astype(np.float32) * inv_multiplier
    return -(signed @ query.astype(np.float32))


def test_u8_as_i8_divergence_recall_not_worse():
    """On identical codec bytes, this framework's unsigned dequantization
    must rank at least as accurately as the reference's signed SIMD read.

    The codec stores round((v - min) * inv_scale) in [0, 255] (scalar.rs:
    162-166); its dequantize_value treats the byte as unsigned (scalar.rs:
    168-172), but the SIMD searcher path reinterprets the same byte signed.
    We do not reproduce that inconsistency; this test pins the divergence.
    """
    rng = np.random.default_rng(42)
    n, d, k = 2000, 32, 10
    db = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(20, d)).astype(np.float32)

    quant = ScalarQuantizer(ScalarQuantizerConfig())
    quant.calibrate_from_array(db)
    codes = quant.quantize(db)          # u8 bytes, identical storage
    i8_view = codes.view(np.int8)        # the reference's i8 storage view

    # float ground truth under negated dot product (the measure the
    # reference path implements)
    gt_scores = -(db @ queries.T).T
    gt = np.argsort(gt_scores, axis=1)[:, :k]

    # ours: unsigned dequantize, then the same measure
    ours_rows = quant.dequantize(codes)
    ours_scores = -(ours_rows @ queries.T).T
    ours_rank = np.argsort(ours_scores, axis=1)[:, :k]

    # reference model: signed reinterpretation with inv_multiplier = scale
    ref_scores = np.stack([
        _reference_signed_dot_distances(q, i8_view, quant.scale)
        for q in queries
    ])
    ref_rank = np.argsort(ref_scores, axis=1)[:, :k]

    def recall(pred):
        return np.mean([
            len(set(pred[i]) & set(gt[i])) / k for i in range(len(gt))
        ])

    r_ours, r_ref = recall(ours_rank), recall(ref_rank)
    assert r_ours >= r_ref, (r_ours, r_ref)
    # and ours must actually be accurate, not merely "not worse"
    assert r_ours > 0.95


# ---------------------------------------------------------------------------
# Brute-force exact-ordering parity (reference: tests/stress_tests.rs:326-363
# stress_test_recall_verification — top-K indices AND distances must match an
# exhaustive scalar recomputation on the same data)
# ---------------------------------------------------------------------------

def test_brute_force_matches_exhaustive_recompute(rng):
    from scann_tpu.models.brute_force import BruteForceSearcher

    n, d, k = 1000, 32, 10
    db = rng.uniform(size=(n, d)).astype(np.float32)
    query = rng.uniform(size=(1, d)).astype(np.float32)
    s = BruteForceSearcher(DenseDataset(db))
    idx, dist = s.search_batched_arrays(query, k)
    exact = ((db - query) ** 2).sum(axis=1)
    order = np.argsort(exact, kind="stable")[:k]
    np.testing.assert_array_equal(idx[0], order)
    np.testing.assert_allclose(dist[0], exact[order], rtol=1e-5, atol=1e-5)
