"""Evaluation harness: ANN-Benchmarks-style runner (build time, QPS, recall@k)."""

from scann_tpu.harness.ann_benchmark import (
    BenchmarkData,
    BenchmarkReport,
    average_recall_at_k,
    generate_synthetic_dataset,
    load_json_dataset,
    run_benchmark,
)

__all__ = [
    "BenchmarkData",
    "BenchmarkReport",
    "average_recall_at_k",
    "generate_synthetic_dataset",
    "load_json_dataset",
    "run_benchmark",
]
