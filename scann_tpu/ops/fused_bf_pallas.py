"""Fully-fused small-database exact search kernel.

For workloads whose database PLUS the [B, N] distance matrix (and its
column iota) fit scoped VMEM together — see ``vmem_resident_limit_bytes``
and the batch-aware gate in ``BruteForceSearcher._use_fused_vmem``; e.g.
the reference's headline 10k x 64d workload at B<=100 — the whole search,
distance matmul + top-k, runs as ONE Pallas kernel with zero intermediate
HBM traffic and a single launch. XLA's composed program (matmul kernel +
top_k kernel + masking kernels) costs ~0.7ms at this size purely in per-op
overhead; this kernel replaces it with one VMEM-resident program.

Top-k uses k rounds of min + argmin + mask (k <= 16): at small k this is
cheaper than any sort and vectorizes perfectly on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.types import MASKED_DISTANCE


def _kernel(q_ref, db_ref, norms_ref, nv_ref, vals_ref, idx_ref, *, k: int,
            out_cols: int):
    q = q_ref[:]                                   # [B, D]
    dots = jax.lax.dot_general(
        q, db_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact search: f32 passes
    )                                              # [B, N]
    b, n = dots.shape
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    dists = q_sq + norms_ref[0:1, :] - 2.0 * dots
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    dists = jnp.where(col < nv_ref[0], jnp.maximum(dists, 0.0), MASKED_DISTANCE)

    vals_ref[:] = jnp.full((b, out_cols), jnp.inf, jnp.float32)
    idx_ref[:] = jnp.full((b, out_cols), -1, jnp.int32)
    for j in range(k):  # static unroll; scatter isn't lowerable in mosaic
        m = jnp.min(dists, axis=1)                 # [B]
        am = jnp.min(jnp.where(dists <= m[:, None], col, n + 1), axis=1)
        good = m < MASKED_DISTANCE / 2
        vals_ref[:, j] = jnp.where(good, m, jnp.inf)
        idx_ref[:, j] = jnp.where(good, am, -1)
        dists = jnp.where(col == am[:, None], MASKED_DISTANCE, dists)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fused_bf_search_pallas(queries: jnp.ndarray, db: jnp.ndarray,
                           db_sq_norms: jnp.ndarray, n_valid: jnp.ndarray,
                           *, k: int, interpret: bool = False):
    """(dists [B, k], indices [B, k]) exact squared-L2 search, one kernel.

    Args:
        queries: [B, D] f32 (B padded to a sublane multiple by the caller).
        db: [N, D] f32 — must fit in VMEM alongside the [B, N] distances.
        db_sq_norms: [1, N] f32 row of squared norms.
        n_valid: [1] int32.
    """
    b = queries.shape[0]
    out_cols = 128  # lane-width padded output; slice [:k] outside
    vals, idxs = pl.pallas_call(
        functools.partial(_kernel, k=k, out_cols=out_cols),
        out_shape=(
            jax.ShapeDtypeStruct((b, out_cols), jnp.float32),
            jax.ShapeDtypeStruct((b, out_cols), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(queries, db, db_sq_norms, n_valid)
    return vals[:, :k], idxs[:, :k]


def vmem_resident_limit_bytes() -> int:
    """Total scoped-VMEM budget for the fused single-kernel path: the
    hardware scoped limit is 16 MB; leave ~2 MB slack for operand copies
    and reduction temps. Callers must estimate db + [B, N] dists + iota +
    queries + outputs against this (batch-aware — see
    BruteForceSearcher._use_fused_vmem)."""
    return 14 * 1024 * 1024
