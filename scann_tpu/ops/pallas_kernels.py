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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


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
    grid = (_cdiv(n, tile_n),)

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
                              interpret=not _is_tpu(), out_dtype=out_dtype)


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
    grid = (_cdiv(n, tile_n),)
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
    return int8_dots_pallas(queries, codes_t, tile_n=tile_n, interpret=not _is_tpu())
