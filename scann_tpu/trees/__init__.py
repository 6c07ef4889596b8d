"""Training math and tree structures: on-device k-means, hierarchical k-means tree."""

from scann_tpu.trees.kmeans import KMeans, KMeansConfig, KMeansResult, KMeansInit

__all__ = ["KMeans", "KMeansConfig", "KMeansResult", "KMeansInit"]
