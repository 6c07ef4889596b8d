"""Pallas TPU kernels for the scoring hot loops.

These replace the reference's AVX2 inner loops with explicit VMEM-resident
kernels (reference: src/hashes/lut16_simd.rs:172-299 PSHUFB LUT16 batch,
src/distance_measures/one_to_many_asymmetric.rs:209-261 int8 FMA loop):

  * ``lut16_score_pallas`` — per-query [S,16] tables stay in VMEM for the
    whole sweep; code tiles stream HBM->VMEM; the 4-bit lookup becomes an
    on-the-fly one-hot built in VMEM (VPU compare vs an iota) feeding one
    MXU matmul per tile. TPU has no byte shuffle; this is the MXU-shaped
    equivalent: the one-hot never exists in HBM.
  * ``int8_dots_pallas`` — u8 codes tile converted in VMEM and contracted
    against the f32 query block on the MXU: the asymmetric dequant-fused
    matmul without materializing an f32 copy of the database in HBM.

Both kernels take the code matrix **transposed** ([S, N] / [D, N]) so the
streamed dimension N lies on 128-wide lanes — the natural TPU layout; the
byte-compatible [N, S] layout converts at device-upload time.

Interpret mode (CPU tests) uses the same kernels via ``interpret=True``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from scann_tpu.types import cdiv, is_tpu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# LUT16 scoring
# ---------------------------------------------------------------------------


def _lut16_kernel(luts_ref, codes_ref, out_ref, *, num_codes: int):
    # luts_ref: [B, S*C] f32 (resident); codes_ref: [S, TN] u8; out: [B, TN]
    s, tn = codes_ref.shape
    codes = codes_ref[:].astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (s, num_codes, tn), 1)
    onehot = (codes[:, None, :] == iota).astype(jnp.bfloat16)
    onehot = onehot.reshape(s * num_codes, tn)
    acc = jax.lax.dot_general(
        luts_ref[:].astype(jnp.bfloat16), onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "out_dtype"))
def lut16_score_pallas(luts: jnp.ndarray, codes_t: jnp.ndarray,
                       tile_n: int = 2048, interpret: bool = False,
                       out_dtype=jnp.float32) -> jnp.ndarray:
    """Approximate distances [B, N] from VMEM-resident LUTs.

    Args:
        luts: [B, S, C] f32 per-query tables (C <= 16 intended).
        codes_t: [S, N] uint8 transposed database codes (N padded to tile_n).
        out_dtype: bf16 halves the score-matrix HBM traffic — the dominant
            cost of a full sweep at database scale; PQ quantization error
            dwarfs bf16 rounding, and candidates are exact-reranked anyway.

    Returns [B, N] scores: out[b, n] = sum_s luts[b, s, codes_t[s, n]].
    """
    b, s, c = luts.shape
    n = codes_t.shape[1]
    luts_flat = luts.reshape(b, s * c)
    grid = (cdiv(n, tile_n),)

    return pl.pallas_call(
        functools.partial(_lut16_kernel, num_codes=c),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, s * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * c * n,
            bytes_accessed=s * n + b * s * c * 4 + b * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(luts_flat, codes_t)


def lut16_score_auto(luts: jnp.ndarray, codes_t: jnp.ndarray,
                     tile_n: int = 2048, out_dtype=jnp.float32) -> jnp.ndarray:
    """Pallas on TPU, interpret-mode fallback elsewhere."""
    return lut16_score_pallas(luts, codes_t, tile_n=tile_n,
                              interpret=not is_tpu(), out_dtype=out_dtype)


# ---------------------------------------------------------------------------
# Fused int8 LUT16 sweep with in-kernel block-min reduction
# ---------------------------------------------------------------------------

# Sentinel for masked-out blocks in the combined output. Any real combined
# value is <= (255*S_max + 128*S_pad)*r + r < 2^24, far below this.
INVALID_COMBINED = 1e9


def _lut16_fused_kernel(nv_ref, luts_ref, codes_ref, out_ref, *,
                        num_codes: int, r: int, tile_n: int):
    """One tile of the fused sweep.

    The score matrix never reaches HBM: the int8 one-hot contraction runs on
    the MXU and the [TN, B] integer accumulator is reduced r:1 in VMEM. Value
    and local argmin are packed into ONE exact-integer f32:

        combined = (acc + 128*S_pad) * r + local_index   (< 2^24, exact)

    so min() selects the best (value, index) pair in a single reduction and
    the output is a single [TN/r, B] f32 block (HBM write traffic drops
    ~{2*r}x vs materializing bf16 scores + reading them back for top-k).

    This is the TPU shape of the reference's u8-quantized PSHUFB tables
    (reference: src/hashes/lut16_simd.rs:172-299): u8 tables (stored biased
    as i8 so the MXU can consume them), integer accumulation, one dequant at
    the end — done by the caller on the pre_k survivors only.
    """
    sh, tn = codes_ref.shape                        # [S_pad/2, TN]
    v = codes_ref[:].astype(jnp.int32)
    # packed low-nibble-first along S (reference layout, lut16.rs:43-61):
    # byte j holds subspaces 2j (low) and 2j+1 (high) -> concat gives the
    # even-first subspace order the caller's LUT rows are permuted to match
    codes = jnp.concatenate([v & 0xF, v >> 4], axis=0)   # [S_pad, TN]
    s = 2 * sh
    iota = jax.lax.broadcasted_iota(jnp.int32, (s, num_codes, tn), 1)
    onehot = (codes[:, None, :] == iota).astype(jnp.int8)
    onehot = onehot.reshape(s * num_codes, tn)
    acc = jax.lax.dot_general(
        onehot, luts_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                               # [TN, B] integer sums
    b = acc.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (tn, b), 0)
    comb = ((acc + 128 * s) * r + row % r).astype(jnp.float32)
    gidx = pl.program_id(0) * tile_n + row
    comb = jnp.where(gidx < nv_ref[0], comb, INVALID_COMBINED)
    out_ref[:] = jnp.min(comb.reshape(tn // r, r, b), axis=1)


@functools.partial(jax.jit, static_argnames=("tile_n", "r", "interpret"))
def lut16_fused_sweep_pallas(luts_i8: jnp.ndarray, codes_packed_t: jnp.ndarray,
                             n_valid, tile_n: int = 1024, r: int = 32,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused LUT16 sweep + block-min. Returns [N/r, B] f32 combined values.

    Args:
        luts_i8: [B, S_pad*C] int8 quantized tables in even-first subspace
            order, biased by -128 (see hashes/lut.py::luts_i8_evenfirst).
        codes_packed_t: [S_pad/2, N] uint8 packed nibbles, N % tile_n == 0.
        n_valid: int32 scalar — points >= n_valid emit INVALID_COMBINED.

    Decode: sumq = int(out) // r; point = block*r + int(out) % r;
    distance = sumq * multiplier + bias * S_real.
    """
    b = luts_i8.shape[0]
    sh, n = codes_packed_t.shape
    c = luts_i8.shape[1] // (2 * sh)
    grid = (cdiv(n, tile_n),)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    return pl.pallas_call(
        functools.partial(_lut16_fused_kernel, num_codes=c, r=r, tile_n=tile_n),
        out_shape=jax.ShapeDtypeStruct((n // r, b), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 2 * sh * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sh, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n // r, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 2 * sh * c * n,
            bytes_accessed=sh * n + (n // r) * b * 4 + b * 2 * sh * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nv, luts_i8, codes_packed_t)


def lut16_fused_sweep_auto(luts_i8: jnp.ndarray, codes_packed_t: jnp.ndarray,
                           n_valid, tile_n: int = 1024, r: int = 32) -> jnp.ndarray:
    return lut16_fused_sweep_pallas(luts_i8, codes_packed_t, n_valid,
                                    tile_n=tile_n, r=r, interpret=not is_tpu())


# ---------------------------------------------------------------------------
# int8 asymmetric dots
# ---------------------------------------------------------------------------


def _int8_dots_kernel(q_ref, codes_ref, out_ref):
    # q_ref: [B, D] f32 (resident); codes_ref: [D, TN] u8; out: [B, TN] f32
    # mosaic can't cast u8->bf16 directly; go through i32 (values 0..255
    # are exact in bf16's 8 mantissa bits)
    c = codes_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot_general(
        q_ref[:], c,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def int8_dots_pallas(queries: jnp.ndarray, codes_t: jnp.ndarray,
                     tile_n: int = 2048, interpret: bool = False) -> jnp.ndarray:
    """Raw dots [B, N] between f32 queries and u8 codes (dequant affine is
    applied by the caller via the scale/offset trick, ops/asymmetric.py).

    Args:
        queries: [B, D] f32.
        codes_t: [D, N] uint8 transposed codes (N padded to tile_n).
    """
    b, d = queries.shape
    n = codes_t.shape[1]
    grid = (cdiv(n, tile_n),)
    return pl.pallas_call(
        _int8_dots_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * n,
            bytes_accessed=d * n + b * d * 4 + b * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(jnp.float32), codes_t)


def int8_dots_auto(queries: jnp.ndarray, codes_t: jnp.ndarray,
                   tile_n: int = 2048) -> jnp.ndarray:
    return int8_dots_pallas(queries, codes_t, tile_n=tile_n, interpret=not is_tpu())
