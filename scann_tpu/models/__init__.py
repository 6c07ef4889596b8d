"""Searchers ("model families"): brute force, scalar-quantized, partitioned,
asymmetric hashing, tree-×-AH hybrid, and the unified Scann facade."""

from scann_tpu.models.searcher import SearchParameters, SearchResult, NNResult, Searcher

__all__ = ["SearchParameters", "SearchResult", "NNResult", "Searcher"]
