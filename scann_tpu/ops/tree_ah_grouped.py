"""Grouped MXU leaf-scoring kernel for tree-×-AH.

Round-1's CSR kernel scored one (query, partition) pair per grid step with a
VPU select-reduce — S·C·L VPU work per pair, MXU idle, and the one-hot code
expansion rebuilt for every pair. This kernel restructures the work around
the observation that **many queries probe the same partition**: pairs are
grouped by partition (device-side sort, no host round trip), the one-hot
expansion of a partition's codes is built once per group, and scoring
becomes a real MXU contraction

    [q_cap, S·C] residual LUTs  ×  [S·C, l_tile] code one-hots

for every group × L-tile. Work is size-adaptive: L-tiles beyond a
partition's size skip DMA + matmul entirely and just emit the masked
sentinel, so skewed partitions cost what they contain, not l_cap.

This is the TPU shape of the reference's per-partition scoring loop
(reference: src/tree_x_hybrid/mod.rs:297-339) — its rayon threads become
grid steps, its scalar LUT loop a matmul, its per-partition candidate
vectors one CSR layout in HBM.

Layout contract (same as ops/tree_ah_pallas.py):
  - codes_csr [S_pad, N_csr] uint8, partition-contiguous columns, every
    partition start 128-aligned, S_pad a multiple of 32;
  - luts [B·p, S_pad·C] with zero rows for pad subspaces.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.types import MASKED_DISTANCE

# int16 sentinel for masked slots on the int8-LUT path: real scores are
# bounded by s_pad * 255 (asserted < 32767 in the wrapper)
I16_MASK = 32767


def group_pairs_by_partition(
    parts: jnp.ndarray, num_partitions: int, q_cap: int
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Group the [B, p] selected-partition pairs by partition id, q_cap
    pairs per group (a partition probed by more queries spans several
    groups; every group holds pairs of exactly one partition).

    Runs entirely on device (sort + scans) — no host sync between partition
    selection and leaf scoring.

    Returns:
        grp_part: [NG] int32 partition id per group, **-1 for unused
            groups** — callers must zero those groups' sizes so the kernel
            skips their DMA and compute entirely (an early version scored
            partition 0's codes for every unused group: ~44% wasted grid
            steps at B=1024, p=10, 3.8k partitions).
        slot: [B*p] int32 row of each pair in the [NG*q_cap] grouped layout.
        NG: static group-count upper bound,
            min(T, B·p) + ceil(B·p / q_cap) — each distinct partition can
            open at most one partially-filled group.
    """
    b, p = parts.shape
    bp = b * p
    ng = min(int(num_partitions), bp) + -(-bp // q_cap)
    flat = parts.reshape(-1).astype(jnp.int32)
    order = jnp.argsort(flat)                     # stable
    sp = jnp.take(flat, order)
    idx = jnp.arange(bp, dtype=jnp.int32)
    newrun = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sp[1:] != sp[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(newrun, idx, 0))    # cummax of run heads
    rank = idx - run_start
    newgrp = newrun | (rank % q_cap == 0)
    grp_id = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
    slot_sorted = grp_id * q_cap + rank % q_cap
    slot = jnp.zeros((bp,), jnp.int32).at[order].set(slot_sorted)
    grp_part = jnp.full((ng,), -1, jnp.int32).at[grp_id].set(sp)
    return grp_part, slot, ng


def _kernel(off_ref, size_ref, luts_ref, codes_ref, out_ref, scratch, sems,
            *, num_codes: int, l_tile: int, n_ltiles: int, ng: int,
            packed: bool = False):
    g = pl.program_id(0)
    lt = pl.program_id(1)
    flat = g * n_ltiles + lt
    size = size_ref[g]
    active = lt * l_tile < size

    # Double-buffered DMA over the sequential (group, tile) walk: each step
    # starts the next *active* step's copy before waiting on its own.
    def dma_for(gg, tt, slot):
        off = pl.multiple_of(off_ref[gg], 128) + tt * l_tile
        return pltpu.make_async_copy(
            codes_ref.at[:, pl.ds(off, l_tile)], scratch.at[slot], sems.at[slot])

    slot = jax.lax.rem(flat, 2)
    next_slot = jax.lax.rem(flat + 1, 2)

    @pl.when((flat == 0) & active)
    def _():
        dma_for(g, lt, slot).start()

    nxt = flat + 1
    ng_next = nxt // n_ltiles
    lt_next = jax.lax.rem(nxt, n_ltiles)
    next_active = (nxt < ng * n_ltiles) & (
        lt_next * l_tile < size_ref[jnp.minimum(ng_next, ng - 1)])

    @pl.when(next_active)
    def _():
        dma_for(ng_next, lt_next, next_slot).start()

    int8_path = luts_ref.dtype == jnp.int8
    masked = I16_MASK if int8_path else MASKED_DISTANCE

    @pl.when(active)
    def _():
        dma_for(g, lt, slot).wait()
        codes = scratch[slot].astype(jnp.int32)                 # [S_pad, Lt]
        if packed:
            # packed low-nibble-first along S (reference layout,
            # lut16.rs:43-61): byte j holds subspaces 2j (low) and 2j+1
            # (high); concat gives the even-first subspace order the
            # caller's LUT columns are permuted to match (same unpack as
            # ops/pallas_kernels._lut16_fused_kernel) — the code stream
            # and slab HBM halve
            codes = jnp.concatenate([codes & 0xF, codes >> 4], axis=0)
        s_pad = codes.shape[0]
        iota_c = jax.lax.broadcasted_iota(
            jnp.int32, (s_pad, num_codes, l_tile), 1)
        if int8_path:
            # int8 MXU contraction: LUT bytes are quantized (lut-lo)/scale
            # - 128; the i32 result maps back to real units by one affine
            # (see tree_x_hybrid._finalize caller) — rank-exact either way
            onehot = (codes[:, None, :] == iota_c).astype(jnp.int8)
            onehot = onehot.reshape(s_pad * num_codes, l_tile)
            scores = jnp.dot(luts_ref[0], onehot,
                             preferred_element_type=jnp.int32)
        else:
            onehot = (codes[:, None, :] == iota_c).astype(jnp.bfloat16)
            onehot = onehot.reshape(s_pad * num_codes, l_tile)
            scores = jnp.dot(luts_ref[0], onehot,
                             preferred_element_type=jnp.float32)
        col = lt * l_tile + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1)
        # narrow output (i16 / bf16): these are PQ-approximate pre-rank
        # scores and the [NG*q_cap, l_cap] buffer dominates HBM writes
        out_ref[0] = jnp.where(col < size, scores,
                               masked).astype(out_ref.dtype)

    @pl.when(~active)
    def _():
        out_ref[0] = jnp.full(out_ref.shape[1:], masked, out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("l_cap", "l_tile", "q_cap", "interpret",
                                    "packed"))
def tree_ah_grouped_scores_pallas(
    luts_grouped: jnp.ndarray,   # [NG*q_cap, S_pad*C] bf16/f32 grouped LUTs
    codes_csr: jnp.ndarray,      # [S_pad, N_csr] uint8 CSR layout
    grp_offsets: jnp.ndarray,    # [NG] int32 CSR column start per group
    grp_sizes: jnp.ndarray,      # [NG] int32 partition size per group
    *, l_cap: int, l_tile: int = 256, q_cap: int = 32,
    interpret: bool = False, packed: bool = False,
) -> jnp.ndarray:
    """[NG*q_cap, l_cap] scores (masked beyond each size).

    int8 LUT input -> int16 scores (I16_MASK sentinel for masked slots,
    real scores bounded by s_pad*255); float input -> bf16 scores with
    MASKED_DISTANCE. Rows of unused group slots contain garbage — callers
    gather rows back through the pair->slot map, which only references
    real pairs.

    ``packed=True``: ``codes_csr`` is [S_pad/2, N_csr] uint8, two 4-bit
    codes per byte low-nibble-first along S (reference layout,
    lut16.rs:43-61, served packed as in lut16_simd.rs:172-299); the LUT
    columns must be permuted to even-first subspace order. Halves the
    per-tile code DMA stream and the slab HBM.
    """
    ngq, sc = luts_grouped.shape
    s_half = codes_csr.shape[0]
    s_pad = 2 * s_half if packed else s_half
    c = sc // s_pad
    assert s_pad * c == sc, (s_pad, sc)
    if packed:
        assert c <= 16, f"packed int4 codes require num_codes <= 16, got {c}"
    ng = ngq // q_cap
    assert ng * q_cap == ngq
    assert l_cap % l_tile == 0, (l_cap, l_tile)
    n_ltiles = l_cap // l_tile

    int8_path = luts_grouped.dtype == jnp.int8
    if int8_path:
        assert s_pad * 255 < I16_MASK, s_pad
        luts3 = luts_grouped.reshape(ng, q_cap, sc)
        out_dtype = jnp.int16
        lut_bytes = 1
    else:
        luts3 = luts_grouped.reshape(ng, q_cap, sc).astype(jnp.bfloat16)
        out_dtype = jnp.bfloat16
        lut_bytes = 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ng, n_ltiles),
        in_specs=[
            pl.BlockSpec((1, q_cap, sc), lambda g, lt, off, sz: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_cap, l_tile),
                               lambda g, lt, off, sz: (g, 0, lt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s_half, l_tile), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, num_codes=c, l_tile=l_tile,
                          n_ltiles=n_ltiles, ng=ng, packed=packed),
        out_shape=jax.ShapeDtypeStruct((ng, q_cap, l_cap), out_dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * ng * q_cap * sc * l_cap,
            bytes_accessed=ng * (s_half * l_cap + q_cap * sc * lut_bytes
                                 + q_cap * l_cap * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(grp_offsets.astype(jnp.int32), grp_sizes.astype(jnp.int32),
      luts3, codes_csr)
    return out.reshape(ngq, l_cap)
