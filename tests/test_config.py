"""Config dataclasses: builders, predicates, JSON round-trip
(reference test analog: src/config.rs:373-383)."""

import json

from scann_tpu import (
    BruteForceConfig,
    DistanceMeasure,
    ExactReorderingConfig,
    HashConfig,
    PartitioningConfig,
    ScannConfig,
)
from scann_tpu.config import HashType, LutFormat


def test_defaults_match_reference():
    cfg = ScannConfig()
    assert cfg.num_neighbors == 10
    assert cfg.distance_measure == DistanceMeasure.SQUARED_L2
    p = PartitioningConfig()
    assert (p.num_partitions, p.num_partitions_to_search) == (100, 10)
    assert p.max_training_iterations == 100
    h = HashConfig()
    assert (h.num_buckets, h.num_blocks) == (256, 16)
    assert h.training_sample_size == 100_000
    assert ExactReorderingConfig().num_candidates == 100


def test_builders():
    cfg = (
        ScannConfig()
        .with_num_neighbors(20)
        .with_distance_measure(DistanceMeasure.COSINE)
        .with_partitioning(PartitioningConfig(num_partitions=50).with_partitions_to_search(5))
        .with_hashing(HashConfig().with_blocks(8))
        .with_reordering(ExactReorderingConfig(num_candidates=200))
    )
    assert cfg.num_neighbors == 20
    assert cfg.has_partitioning() and cfg.has_hashing() and cfg.has_reordering()
    assert cfg.partitioning.num_partitions_to_search == 5
    assert cfg.hash.num_blocks == 8


def test_json_round_trip():
    cfg = (
        ScannConfig()
        .with_distance_measure(DistanceMeasure.DOT_PRODUCT)
        .with_brute_force(BruteForceConfig().with_scalar_quantization(8))
        .with_hashing(HashConfig().with_type(HashType.PRODUCT_QUANTIZATION)
                      .with_lut_format(LutFormat.FLOAT))
    )
    s = cfg.to_json()
    json.loads(s)  # valid JSON
    back = ScannConfig.from_json(s)
    assert back.distance_measure == DistanceMeasure.DOT_PRODUCT
    assert back.brute_force.scalar_quantization and back.brute_force.quantization_bits == 8
    assert back.hash.hash_type == HashType.PRODUCT_QUANTIZATION
    assert back.hash.lut_format == LutFormat.FLOAT
    assert back.partitioning is None
