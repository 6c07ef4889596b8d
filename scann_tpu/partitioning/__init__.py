"""Partitioning: k-means tree partitioner with CSR / padded-leaf device layouts."""

from scann_tpu.partitioning.partitioner import PartitionResult, DatabaseTokenization
from scann_tpu.partitioning.tree_partitioner import TreePartitioner, TreePartitionerConfig

__all__ = [
    "PartitionResult",
    "DatabaseTokenization",
    "TreePartitioner",
    "TreePartitionerConfig",
]
