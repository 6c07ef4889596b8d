"""Convenience prelude: ``from scann_tpu.prelude import *``
(reference: src/lib.rs:136-214 exports a prelude module)."""

from scann_tpu import (
    BruteForceSearcher,
    DenseDataset,
    DistanceMeasure,
    DocIdCollection,
    ErrorCode,
    ExactReorderingConfig,
    HashConfig,
    NNResult,
    PartitionedSearcher,
    PartitioningConfig,
    ScalarQuantizedBruteForceSearcher,
    ScalarQuantizedConfig,
    Scann,
    ScannBuilder,
    ScannConfig,
    ScannError,
    SearchMode,
    SearchParameters,
    SearchResult,
    SparseBruteForceSearcher,
    SparseDataset,
    TreeXHybridConfig,
    TreeXHybridSearcher,
    load_index,
    save_index,
)
from scann_tpu.hashes import AsymmetricHasher, AsymmetricHasherConfig, Codebook
from scann_tpu.mutator import DynamicSearcher, MutableDataset, MutationBuffer
from scann_tpu.restricts import (
    CrowdingConstraint,
    NoRestrict,
    PredicateFilter,
    RangeFilter,
    RestrictAllowlist,
)
from scann_tpu.trees.kmeans import KMeans, KMeansConfig

__all__ = [
    "BruteForceSearcher", "DenseDataset", "DistanceMeasure", "DocIdCollection",
    "ErrorCode", "ExactReorderingConfig", "HashConfig", "NNResult",
    "PartitionedSearcher", "PartitioningConfig",
    "ScalarQuantizedBruteForceSearcher", "ScalarQuantizedConfig", "Scann",
    "ScannBuilder", "ScannConfig", "ScannError", "SearchMode",
    "SearchParameters", "SearchResult", "SparseBruteForceSearcher",
    "SparseDataset", "TreeXHybridConfig", "TreeXHybridSearcher",
    "load_index", "save_index", "AsymmetricHasher", "AsymmetricHasherConfig",
    "Codebook", "DynamicSearcher", "MutableDataset", "MutationBuffer",
    "CrowdingConstraint", "NoRestrict", "PredicateFilter", "RangeFilter",
    "RestrictAllowlist", "KMeans", "KMeansConfig",
]
