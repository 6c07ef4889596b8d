"""Data containers: dense/sparse datasets and document-id tables."""

from scann_tpu.data.dataset import DenseDataset, SparseDataset, Datapoint
from scann_tpu.data.docid import DocIdCollection

__all__ = ["DenseDataset", "SparseDataset", "Datapoint", "DocIdCollection"]
