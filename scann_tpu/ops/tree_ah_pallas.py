"""Pallas CSR leaf-scoring kernel for tree-×-AH.

The XLA tree-AH path scores leaves by gathering [B, p, L_max, S] codes per
query — random-access gather plus padded duplication. This kernel instead
stores codes in **CSR order** (rows sorted by partition, so each partition's
codes are contiguous in HBM) and, for every (query, selected-partition)
pair, DMAs exactly that partition's code block HBM→VMEM at a
scalar-prefetched dynamic offset, then scores it against the pair's residual
LUT with the VMEM one-hot + MXU contraction of the LUT16 kernel
(ops/pallas_kernels.py).

This is the TPU shape of the reference's per-partition scoring loop
(reference: src/tree_x_hybrid/mod.rs:297-339) with the thread pool replaced
by the (B, p) grid and the scalar LUT loop by a matmul.

Layout contract:
  - codes_csr [S, N_pad] uint8, transposed and partition-contiguous along
    N (candidates on the lane dimension), padded with >= L_cap extra
    columns so every DMA stays in bounds;
  - csr_offsets[t] = first CSR row of partition t (host-precomputed);
  - partitions are balanced so size <= L_cap (builder guarantees).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.types import MASKED_DISTANCE


def _kernel(off_ref, size_ref, luts_ref, codes_ref, out_ref, scratch, sems,
            *, num_codes: int, l_cap: int, num_p: int):
    b = pl.program_id(0)
    pp = pl.program_id(1)
    nb = pl.num_programs(0)
    flat = b * num_p + pp
    total = nb * num_p
    size = size_ref[flat]

    # Double-buffered DMA: grid steps run sequentially, so each step starts
    # the NEXT (query, partition) pair's copy before waiting on its own —
    # the per-partition DMA latency overlaps the previous step's compute.
    # CSR partition starts are 128-aligned by the builder; the hint lets
    # mosaic prove the DMA lane offsets are tile-aligned.
    def dma_for(idx, slot):
        off = pl.multiple_of(off_ref[idx], 128)
        return pltpu.make_async_copy(
            codes_ref.at[:, pl.ds(off, l_cap)], scratch.at[slot], sems.at[slot])

    slot = jax.lax.rem(flat, 2)
    next_slot = jax.lax.rem(flat + 1, 2)

    @pl.when(flat == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(flat + 1 < total)
    def _():
        dma_for(flat + 1, next_slot).start()

    dma_for(flat, slot).wait()

    s = scratch.shape[1]
    codes = scratch[slot].astype(jnp.int32)                   # [S, L]
    iota = jax.lax.broadcasted_iota(jnp.int32, (s, num_codes, l_cap), 1)
    onehot = (codes[:, None, :] == iota).astype(jnp.float32)
    # merge the LEADING dims (the lane dim stays L — mosaic supports this
    # reshape; merging trailing dims is an unsupported shape cast)
    onehot = onehot.reshape(s * num_codes, l_cap)
    # select-and-reduce on the VPU: a matvec against one LUT row trips a
    # mosaic bf16 matvec bug and would run the MXU at single-column occupancy
    scores = jnp.sum(onehot * luts_ref[0, 0, :][:, None], axis=0)  # [L]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, l_cap), 1)[0, :]
    out_ref[0, 0, :] = jnp.where(row < size, scores, MASKED_DISTANCE)


@functools.partial(jax.jit, static_argnames=("l_cap", "interpret"))
def tree_ah_leaf_scores_pallas(
    luts: jnp.ndarray,        # [B, p, S, C] f32 per-(query,partition) tables
    codes_csr: jnp.ndarray,   # [S, N_pad] uint8 CSR-ordered, transposed
    offsets: jnp.ndarray,     # [B, p] int32 CSR start row of each selection
    sizes: jnp.ndarray,       # [B, p] int32 partition sizes
    *, l_cap: int, interpret: bool = False,
) -> jnp.ndarray:
    """[B, p, l_cap] scores (MASKED_DISTANCE beyond each partition's size).

    codes_csr's leading (subspace) dim must be padded to a multiple of 32
    (u8 sublane tiling for the DMA slice); the LUT rows for pad subspaces
    are zero-filled here, so pad codes contribute nothing.
    """
    b, p, s, c = luts.shape
    s_pad = codes_csr.shape[0]
    if s_pad != s:
        luts = jnp.pad(luts, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        s = s_pad
    luts_flat = luts.reshape(b * p, 1, s * c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, p),
        in_specs=[
            pl.BlockSpec((1, 1, s * c), lambda bb, pp, off, sz: (bb * p + pp, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # 3-D output so the block's trailing dims equal the array dims
        # (mosaic requires trailing block dims divisible by (8, 128) or
        # exactly matching the array)
        out_specs=pl.BlockSpec((1, 1, l_cap), lambda bb, pp, off, sz: (bb * p + pp, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s, l_cap), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, num_codes=c, l_cap=l_cap, num_p=p),
        out_shape=jax.ShapeDtypeStruct((b * p, 1, l_cap), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * l_cap * s * c,
            bytes_accessed=b * p * l_cap * s + b * p * s * c * 4 + b * p * l_cap * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(offsets.reshape(-1).astype(jnp.int32), sizes.reshape(-1).astype(jnp.int32),
      luts_flat, codes_csr)
    return out.reshape(b, p, l_cap)
