"""Hierarchical k-means tree (reference: src/trees/kmeans_tree.rs).

Recursive k-means: each internal node clusters its points with the on-device
k-means and recurses; a node becomes a leaf when depth >= max_depth, or it
holds <= min_leaf_size points, or <= num_children points
(reference: kmeans_tree.rs:224-226). Search is greedy best-first DFS over
node centers with an early stop after k*2 leaf candidates
(reference: kmeans_tree.rs:321-355).

The production path is depth-1 (flat) via TreePartitioner; the hierarchy
exists for very large K where one [B, K] centroid matmul gets too wide.
Leaves are numbered in build order so the tree doubles as a partitioner
(leaf id = partition token).
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import List, Optional

import numpy as np

from scann_tpu.errors import ScannError
from scann_tpu.trees.kmeans import KMeans, KMeansConfig, KMeansInit


@dataclasses.dataclass
class KMeansTreeConfig:
    """(reference: kmeans_tree.rs:20-85)."""

    num_children: int = 100
    max_depth: int = 1
    min_leaf_size: int = 1
    max_iterations: int = 25
    seed: int = 42


class KMeansTreeNode:
    """(reference: kmeans_tree.rs:87-102)."""

    def __init__(self, center: np.ndarray, depth: int):
        self.center = center
        self.depth = depth
        self.children: List["KMeansTreeNode"] = []
        self.indices: Optional[np.ndarray] = None  # leaf point ids
        self.leaf_id: int = -1

    @property
    def is_leaf(self) -> bool:
        return not self.children


class KMeansTree:
    """(reference: kmeans_tree.rs:104-355)."""

    def __init__(self, config: Optional[KMeansTreeConfig] = None):
        self.config = config or KMeansTreeConfig()
        self.root: Optional[KMeansTreeNode] = None
        self.num_leaves = 0
        self._leaves: List[KMeansTreeNode] = []

    def build(self, data) -> "KMeansTree":
        arr = data.numpy() if hasattr(data, "numpy") else np.asarray(data, np.float32)
        if arr.shape[0] == 0:
            raise ScannError.invalid_argument("cannot build tree on empty dataset")
        self._leaves = []
        self.root = self._build_node(arr, np.arange(len(arr), dtype=np.int32),
                                     arr.mean(axis=0), depth=0, seed=self.config.seed)
        self.num_leaves = len(self._leaves)
        return self

    def _build_node(self, data, indices, center, depth, seed) -> KMeansTreeNode:
        cfg = self.config
        node = KMeansTreeNode(center.astype(np.float32), depth)
        n = len(indices)
        if depth >= cfg.max_depth or n <= cfg.min_leaf_size or n <= cfg.num_children:
            node.indices = indices
            node.leaf_id = len(self._leaves)
            self._leaves.append(node)
            return node
        k = min(cfg.num_children, n)
        res = KMeans(KMeansConfig(
            num_clusters=k, max_iterations=cfg.max_iterations,
            init_method=KMeansInit.KMEANS_PLUS_PLUS, seed=seed,
        )).fit(data[indices])
        for c in range(k):
            sub = indices[res.assignments == c]
            if len(sub) == 0:
                continue
            node.children.append(self._build_node(
                data, sub, res.centers[c], depth + 1, seed + 17 * (c + 1)))
        if not node.children:  # degenerate: make leaf
            node.indices = indices
            node.leaf_id = len(self._leaves)
            self._leaves.append(node)
        return node

    # -- introspection ------------------------------------------------------
    def leaves(self) -> List[KMeansTreeNode]:
        return list(self._leaves)

    def leaf_centers(self) -> np.ndarray:
        return np.stack([l.center for l in self._leaves])

    def leaf_assignments(self, n: int) -> np.ndarray:
        """[n] leaf id per datapoint."""
        out = np.full(n, -1, dtype=np.int32)
        for leaf in self._leaves:
            out[leaf.indices] = leaf.leaf_id
        return out

    # -- search --------------------------------------------------------------
    def search_leaves(self, query: np.ndarray, num_leaves: int) -> List[int]:
        """Greedy best-first traversal returning leaf ids nearest-first
        (reference: kmeans_tree.rs:321-355)."""
        if self.root is None:
            raise ScannError.failed_precondition("tree not built")
        q = np.asarray(query, dtype=np.float32)
        heap = [(0.0, 0, self.root)]
        tie = 1
        out: List[int] = []
        while heap and len(out) < num_leaves:
            _, _, node = heapq.heappop(heap)
            if node.is_leaf:
                out.append(node.leaf_id)
                continue
            for ch in node.children:
                d = float(((q - ch.center) ** 2).sum())
                heapq.heappush(heap, (d, tie, ch))
                tie += 1
        return out

    def search_candidates(self, query: np.ndarray, k: int) -> np.ndarray:
        """Candidate point ids from nearest leaves until >= k*2 collected
        (the reference's early-stop heuristic)."""
        if self.root is None:
            raise ScannError.failed_precondition("tree not built")
        q = np.asarray(query, dtype=np.float32)
        heap = [(0.0, 0, self.root)]
        tie = 1
        cand: List[np.ndarray] = []
        total = 0
        while heap and total < 2 * k:
            _, _, node = heapq.heappop(heap)
            if node.is_leaf:
                cand.append(node.indices)
                total += len(node.indices)
                continue
            for ch in node.children:
                d = float(((q - ch.center) ** 2).sum())
                heapq.heappush(heap, (d, tie, ch))
                tie += 1
        return np.concatenate(cand) if cand else np.zeros(0, np.int32)
