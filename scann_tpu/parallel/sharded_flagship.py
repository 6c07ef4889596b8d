"""Database sharding for the flagship searchers (LUT16 sweep + tree-×-AH).

Scale-out pattern (SURVEY §2.6): database rows never move — each shard
scores its own block, re-ranks its own candidates against its own raw rows
(everything local), and only [k]-sized exact partials ride the ICI
(`all_gather` + merge). Recall is >= the single-device searcher at equal
knobs: every shard keeps a full local pre_k, so the global top-pre_k is a
subset of the union of local candidate sets.

Tree-×-AH shards by **partition ownership**: partitions are bin-packed onto
shards by size, each shard holds its partitions' CSR code block plus the
matching raw rows in the same local CSR order (so exact re-ranking gathers
locally), and unowned partitions enter the shared search body with size 0.
Centroids/codebooks replicate (KBs–MBs).

The reference is single-process (Cargo.toml has no distribution deps) — this
module is the TPU-native scale-out the reference never had.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scann_tpu.data.dataset import DenseDataset
from scann_tpu.errors import ScannError
from scann_tpu.hashes.codebook import lut_kernel
from scann_tpu.models.searcher import SearchParameters, Searcher
from scann_tpu.ops.distances import (
    DistanceMeasure,
    gathered_distances,
    squared_norms,
)
from scann_tpu.ops.lut16_scoring import lut_score, lut_score_gathered
from scann_tpu.ops.topk import approx_top_k_smallest, merge_top_k, top_k_smallest
from scann_tpu.parallel.mesh import make_mesh, replicate
from scann_tpu.types import MASKED_DISTANCE, align_up

# ---------------------------------------------------------------------------
# sharded LUT16 sweep (AsymmetricHasher scale-out)
# ---------------------------------------------------------------------------


def sharded_ah_sweep_kernel(mesh: Mesh, *, pre_k: int, k: int,
                            measure: DistanceMeasure, db_axis: str = "db"):
    """fn(centroids, codes [N,S] row-sharded, db [N,D] row-sharded,
    norms [N] sharded, n_valid, queries replicated) -> (dists, idx).

    Per shard: LUT sweep over the local code block -> local approx top-pre_k
    -> local exact re-rank -> local top-k; ICI all_gather + merge.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(db_axis, None), P(db_axis, None), P(db_axis), P(),
                  P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def _kern(centroids, codes_blk, db_blk, norms_blk, n_valid, queries):
        shard = jax.lax.axis_index(db_axis)
        blk = db_blk.shape[0]
        row0 = shard * blk

        luts = lut_kernel(queries, centroids)
        approx = lut_score(luts, codes_blk)                    # [B, blk]
        col = jax.lax.broadcasted_iota(jnp.int32, approx.shape, 1) + row0
        approx = jnp.where(col < n_valid, approx,
                           jnp.asarray(MASKED_DISTANCE, approx.dtype))

        pk = min(pre_k, blk)
        _, cand = approx_top_k_smallest(approx, pk)            # local rows
        rows = jnp.take(db_blk, cand, axis=0)
        nrm = jnp.take(norms_blk, cand, axis=0)
        exact = gathered_distances(measure, queries, rows, nrm)
        exact = jnp.where(cand + row0 < n_valid, exact, MASKED_DISTANCE)
        vals, pos = top_k_smallest(exact, min(k, pk))
        idx = jnp.take_along_axis(cand, pos, axis=1) + row0

        all_vals = jax.lax.all_gather(vals, db_axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, db_axis, axis=1, tiled=True)
        out_vals, out_idx = merge_top_k(all_vals, all_idx, k)
        missing = out_vals >= MASKED_DISTANCE / 2
        return (jnp.where(missing, jnp.inf, out_vals),
                jnp.where(missing, -1, out_idx))

    return jax.jit(_kern)


class ShardedAsymmetricHasher(Searcher):
    """LUT16/PQ sweep with codes + raw rows sharded over the mesh."""

    def __init__(self, hasher, mesh: Optional[Mesh] = None):
        """Wrap a built single-device AsymmetricHasher (train once on host,
        serve sharded)."""
        if hasher.codebook is None or hasher._dataset is None:
            raise ScannError.failed_precondition(
                "hasher must be built with store_dataset=True")
        self._inner = hasher
        self.mesh = mesh or make_mesh(axis_names=("db",))
        n_sh = self.mesh.shape["db"]
        n = hasher.dataset_size()
        n_pad = int(align_up(n, n_sh * 8))

        codes = np.zeros((n_pad, hasher.codes.shape[1]), np.uint8)
        codes[:n] = hasher.codes
        data = hasher._dataset.numpy()
        db = np.zeros((n_pad, data.shape[1]), np.float32)
        db[:n] = data
        sh = lambda a, spec: jax.device_put(a, NamedSharding(self.mesh, spec))
        self._codes = sh(jnp.asarray(codes), P("db", None))
        self._db = sh(jnp.asarray(db), P("db", None))
        self._norms = jax.jit(
            squared_norms,
            out_shardings=NamedSharding(self.mesh, P("db")))(self._db)
        self._cent = replicate(self.mesh, hasher.codebook.centroids_device())
        self._n = n
        self._kernels = {}

    def dataset_size(self) -> int:
        return self._n

    def dimensionality(self) -> int:
        return self._inner.dimensionality()

    def _docids(self):
        return self._inner._docids()

    def search_batched_arrays(self, queries: np.ndarray, k: int,
                              params: Optional[SearchParameters] = None):
        queries = self._validate_queries(queries)
        k = min(int(k), self._n)
        if k <= 0:
            raise ScannError.invalid_argument("k must be positive")
        pre_k = 3 * k
        if params is not None and params.pre_reordering_num_neighbors is not None:
            pre_k = int(params.pre_reordering_num_neighbors)
        pre_k = min(max(pre_k, k), self._n)
        key = (pre_k, k)
        if key not in self._kernels:
            self._kernels[key] = sharded_ah_sweep_kernel(
                self.mesh, pre_k=pre_k, k=k,
                measure=DistanceMeasure.SQUARED_L2)
        q = replicate(self.mesh, jnp.asarray(queries))
        dists, idx = self._kernels[key](
            self._cent, self._codes, self._db, self._norms,
            jnp.int32(self._n), q)
        return np.asarray(idx), np.asarray(dists)


# ---------------------------------------------------------------------------
# sharded tree-×-AH (partition-ownership sharding)
# ---------------------------------------------------------------------------


def sharded_tree_ah_kernel(mesh: Mesh, *, p: int, pre_k: int, k: int,
                           l_cap: int, use_residuals: bool,
                           measure: DistanceMeasure,
                           multiplicity: int = 1,
                           approx_select_min: int = 1024,
                           db_axis: str = "db"):
    """fn(centers, codebook, codes_rows [Sh,L,S], offsets [Sh,K],
    sizes [Sh,K], perm [Sh,L], db_csr [Sh,L,D], norms_csr [Sh,L], queries)
    -> (dists, idx).

    Every shard runs the same partition selection (replicated centroids) and
    scores only the partitions it owns (others have size 0); exact re-rank
    gathers the shard's own raw rows (stored in local CSR order), and the
    [k] exact partials merge over ICI.
    """
    from scann_tpu.models.tree_x_hybrid import _residual_luts, _select_partitions

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(db_axis, None, None), P(db_axis, None),
                  P(db_axis, None), P(db_axis, None), P(db_axis, None, None),
                  P(db_axis, None), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def _kern(centers, codebook, codes_rows, offsets, sizes, perm, db_csr,
              norms_csr, queries):
        codes_rows = codes_rows[0]    # [L_sh, S_pad]
        offsets = offsets[0]          # [K]
        sizes = sizes[0]              # [K] zero for unowned partitions
        perm = perm[0]                # [L_sh]
        db_csr = db_csr[0]            # [L_sh, D]
        norms_csr = norms_csr[0]      # [L_sh]

        b = queries.shape[0]
        parts = _select_partitions(centers, queries, p=p,
                                   approx_min=approx_select_min,
                                   measure=measure)
        s_pad = codes_rows.shape[1]
        c = codebook.shape[1]
        luts_flat = _residual_luts(queries, centers, parts, codebook,
                                   s_pad=s_pad, use_residuals=use_residuals,
                                   measure=measure)

        offs = jnp.take(offsets, parts, axis=0)
        szs = jnp.take(sizes, parts, axis=0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (b, p, l_cap), 2)
        rows = jnp.minimum(offs[:, :, None] + iota_l, perm.shape[0] - 1)
        codes_g = jnp.take(codes_rows, rows.reshape(b, p * l_cap), axis=0)
        # leaf-major interleave — see tree_x_hybrid.tree_ah_search_grouped:
        # partition-major order breaks approx_min_k's layout assumption
        scores = lut_score_gathered(
            luts_flat.reshape(b * p, s_pad, c),
            codes_g.reshape(b * p, l_cap, s_pad),
        ).reshape(b, p, l_cap).transpose(0, 2, 1).reshape(b, p * l_cap)
        valid = (iota_l < szs[:, :, None]).transpose(0, 2, 1).reshape(
            b, p * l_cap)
        flat_scores = jnp.where(valid, scores, MASKED_DISTANCE)
        flat_rows = rows.transpose(0, 2, 1).reshape(b, p * l_cap)

        pk = min(pre_k, p * l_cap)
        pre_vals, pre_pos = approx_top_k_smallest(flat_scores, pk)
        pre_rows = jnp.take_along_axis(flat_rows, pre_pos, axis=1)
        pre_valid = pre_vals < MASKED_DISTANCE / 2

        rrows = jnp.take(db_csr, pre_rows, axis=0)
        rnorm = jnp.take(norms_csr, pre_rows, axis=0)
        exact = gathered_distances(measure, queries, rrows, rnorm)
        exact = jnp.where(pre_valid, exact, MASKED_DISTANCE)
        # over-fetch by the spill multiplicity: a point's copies may live on
        # one shard or several; the deduped global merge needs k*mult slots
        k_local = min(k * max(multiplicity, 1), pk)
        vals, pos = top_k_smallest(exact, k_local)
        sel_rows = jnp.take_along_axis(pre_rows, pos, axis=1)
        idx = jnp.take(perm, sel_rows, axis=0)
        idx = jnp.where(vals < MASKED_DISTANCE / 2, idx, -1)

        all_vals = jax.lax.all_gather(vals, db_axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, db_axis, axis=1, tiled=True)
        if multiplicity > 1:
            from scann_tpu.ops.topk import top_k_unique

            out_vals, out_idx = top_k_unique(all_vals, all_idx, k, multiplicity)
        else:
            out_vals, out_idx = merge_top_k(all_vals, all_idx, k)
        missing = out_vals >= MASKED_DISTANCE / 2
        return (jnp.where(missing, jnp.inf, out_vals),
                jnp.where(missing, -1, out_idx))

    return jax.jit(_kern)


def _bin_pack_partitions(sizes: np.ndarray, n_shards: int) -> np.ndarray:
    """Greedy largest-first bin packing; returns shard id per partition."""
    order = np.argsort(-sizes.astype(np.int64), kind="stable")
    load = np.zeros(n_shards, dtype=np.int64)
    owner = np.zeros(len(sizes), dtype=np.int32)
    for t in order:
        s = int(np.argmin(load))
        owner[t] = s
        load[s] += int(sizes[t]) + 8  # +alignment slop
    return owner


class ShardedTreeXHybridSearcher(Searcher):
    """Tree-×-AH served with partitions bin-packed across the mesh."""

    def __init__(self, searcher, mesh: Optional[Mesh] = None):
        """Wrap a built single-device TreeXHybridSearcher."""
        if searcher.codebook is None:
            raise ScannError.failed_precondition("searcher not built")
        self._inner = searcher
        self.mesh = mesh or make_mesh(axis_names=("db",))
        n_sh = self.mesh.shape["db"]

        tk = searcher.partitioner.tokenization
        data = searcher._dataset.numpy()
        kparts = tk.num_partitions
        sizes = tk.partition_sizes
        owner = _bin_pack_partitions(sizes, n_sh)

        l_tile = max(int(searcher.config.score_l_tile), 128)
        self._l_cap = int(align_up(max(tk.max_partition_size, 8), l_tile))
        s = searcher.codes.shape[1]
        s_pad = int(align_up(s, 32))
        d = data.shape[1]

        # per-shard aligned CSR layouts, padded to a common length
        per_shard = []
        for sh in range(n_sh):
            mine = np.nonzero(owner == sh)[0]
            off_local = np.zeros(kparts, np.int32)
            aligned = 0
            blocks = []
            for t in mine:
                off_local[t] = aligned
                aligned += int(align_up(max(int(sizes[t]), 1), 128))
                blocks.append(t)
            per_shard.append((blocks, off_local, aligned))
        l_sh = int(align_up(max(a for _, _, a in per_shard) + self._l_cap, 8))

        codes_sh = np.zeros((n_sh, l_sh, s_pad), np.uint8)
        perm_sh = np.zeros((n_sh, l_sh), np.int32)
        db_sh = np.zeros((n_sh, l_sh, d), np.float32)
        sizes_sh = np.zeros((n_sh, kparts), np.int32)
        offs_sh = np.zeros((n_sh, kparts), np.int32)
        csr_off = tk.offsets
        for sh, (blocks, off_local, _) in enumerate(per_shard):
            offs_sh[sh] = off_local
            for t in blocks:
                lo, sz = int(off_local[t]), int(sizes[t])
                sizes_sh[sh, t] = sz
                codes_sh[sh, lo : lo + sz, :s] = \
                    searcher.codes[csr_off[t] : csr_off[t] + sz]
                ids = tk.partition_indices(t)
                perm_sh[sh, lo : lo + sz] = ids
                db_sh[sh, lo : lo + sz] = data[ids]

        put = lambda a, spec: jax.device_put(
            jnp.asarray(a), NamedSharding(self.mesh, spec))
        self._codes = put(codes_sh, P("db", None, None))
        self._perm = put(perm_sh, P("db", None))
        self._db = put(db_sh, P("db", None, None))
        self._norms = jax.jit(
            lambda x: jnp.sum(x * x, axis=-1),
            out_shardings=NamedSharding(self.mesh, P("db", None)))(self._db)
        self._sizes = put(sizes_sh, P("db", None))
        self._offs = put(offs_sh, P("db", None))
        self._cent = replicate(self.mesh, searcher.partitioner.centers_device())
        self._cb = replicate(self.mesh, searcher.codebook.centroids_device())
        self._kernels = {}

    def dataset_size(self) -> int:
        return self._inner.dataset_size()

    def dimensionality(self) -> int:
        return self._inner.dimensionality()

    def _docids(self):
        return self._inner._docids()

    def search_batched_arrays(self, queries: np.ndarray, k: int,
                              params: Optional[SearchParameters] = None):
        queries = self._validate_queries(queries)
        cfg = self._inner.config
        n = self.dataset_size()
        k = min(int(k), n)
        if k <= 0:
            raise ScannError.invalid_argument("k must be positive")
        p = cfg.partitions_to_search
        if params is not None and params.num_leaves_to_search is not None:
            p = params.num_leaves_to_search
        p = min(int(p), self._inner.partitioner.num_partitions)
        pre_k = int(np.ceil(k * cfg.pre_reorder_multiplier))
        if params is not None and params.pre_reordering_num_neighbors is not None:
            pre_k = int(params.pre_reordering_num_neighbors)
        pre_k = min(max(pre_k, k), p * self._l_cap)

        mult = self._inner.partitioner.tokenization.max_multiplicity
        key = (p, pre_k, k)
        if key not in self._kernels:
            self._kernels[key] = sharded_tree_ah_kernel(
                self.mesh, p=p, pre_k=pre_k, k=k, l_cap=self._l_cap,
                use_residuals=cfg.use_residuals, measure=cfg.distance_measure,
                multiplicity=mult,
                approx_select_min=cfg.approx_selection_min_partitions)
        q = replicate(self.mesh, jnp.asarray(queries))
        dists, idx = self._kernels[key](
            self._cent, self._cb, self._codes, self._offs, self._sizes,
            self._perm, self._db, self._norms, q)
        return np.asarray(idx), np.asarray(dists)
