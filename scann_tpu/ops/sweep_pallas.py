"""Fused bf16 block-min sweep: the TPU-native high-throughput sweep.

This is a capability the reference cannot express on CPU: a *half-precision
exact* sweep whose [B, N] score matrix never exists in HBM. The database is
stored once as bf16 rows augmented with their squared norm, so the entire
distance computation is ONE MXU matmul per tile:

    row  = [x, ||x||^2, 0...]          (bf16, built once at index time)
    q'   = [-2q, 1, 0...]              (squared-L2)
    score = row . q' = ||x||^2 - 2 q.x (rank-equivalent to squared-L2)

Each [tile_n, B] score block is reduced r:1 in VMEM (min + argmin), so HBM
write traffic is 2/r of the score matrix. The [N/r, B] block minima feed an
approximate top-pre_k, and an exact f32 re-rank of the pre_k survivors
restores full-precision distances. Invalid/padded rows carry a huge value in
the norm slot, so masking costs nothing in-kernel.

Role in the framework: this replaces the reference's production searchers
for databases that fit HBM — measured 129k QPS at recall@10 ~0.995 on
1.18M x 100d (B=1024) vs 46k for the packed-PQ sweep and 37k for the
unpacked LUT16 sweep. The sweep runs at the chip's effective HBM bandwidth
(DMA-floor-bound), i.e. speed of light for a streaming scorer. Recall loss
comes only from bf16 rounding and the one-candidate-per-r-block cap, both
recovered by the exact re-rank for practical (k, r).

Reference counterpart: the brute-force searcher + reordering helper
(src/brute_force/searcher.rs:77-139, src/utils/reordering.rs:22-94) — the
architecture here is TPU-first, not a translation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.ops.distances import DistanceMeasure, gathered_distances
from scann_tpu.ops.topk import approx_top_k_smallest, top_k_smallest
from scann_tpu.types import MASKED_DISTANCE, align_up, cdiv

# Sentinel carried in the augmented norm column of invalid rows. bf16-exact
# (a power of two) and far above any real score, far below bf16 max.
BLOCK_MASK_VALUE = float(2.0 ** 30)

# int8 sweep: the squared norm is carried as THREE base-128 digits in the
# row's padding lanes (digits in [-64, 63], slot multipliers sn * (1, 128,
# 16384) with sn a power of two — every multiplier and digit is exact in
# bf16, so the decoded norm is exact to sn/2). Max encodable magnitude:
INT8_NORM_DIGIT_MAX = 63 + 63 * 128 + 63 * 16384  # 1,040,319
# real norms are scaled to stay below this, leaving >2x margin to the mask
INT8_NORM_REAL_MAX = 400_000


def augmented_dim(d: int) -> int:
    """Minor dim of the augmented row: original + norm slot, sublane-aligned."""
    return align_up(d + 1, 8)


def shuffle_stride_for(n: int) -> int:
    """A multiplicative stride coprime with n, near the golden ratio of n —
    the seedless analog of a random row shuffle. ``i -> (i * s) % n`` spreads
    any cluster-sorted input across the whole array so block minima satisfy
    lax.approx_min_k's uniform-layout assumption.

    Candidate ids translate back through a device inverse-permutation table
    gather on the pre_k survivors only. (NOT via modular arithmetic on
    device: without x64, int64 silently truncates to int32 and ``pos * s``
    overflows past ~2^31 — measured as recall collapsing to 0.003 at 1.18M
    while small-n CPU tests stayed green.)"""
    import math

    s = max(int(0.6180339887 * n) | 1, 1)
    while math.gcd(s, n) != 1:
        s += 2
    return s


def build_augmented_db(db: np.ndarray, n_valid: int, measure: DistanceMeasure,
                       tile_n: int = 2048,
                       shuffle_stride: int = 0,
                       pad_rows_to: int = 0) -> np.ndarray:
    """[N_pad, D1] bf16 augmented rows (built once at index time).

    The norm slot holds ||x||^2 for SQUARED_L2, 0 for DOT_PRODUCT/COSINE
    (cosine rows are L2-normalized here so the sweep scores -cos similarity),
    and BLOCK_MASK_VALUE for padded/invalid rows.

    ``shuffle_stride`` > 0 stores row i at permuted position (i*s) % n_valid
    — see :func:`shuffle_stride_for`. Real-world datasets often arrive
    cluster-sorted (crawl order, label order); without the shuffle the best
    blocks for a query cluster in contiguous block-minima columns and the
    approximate candidate selection degrades (same hazard as the tree-AH
    partition-major layout, BENCH_NOTES round 2).
    """
    db = np.asarray(db, dtype=np.float32)
    n, d = db.shape
    d1 = augmented_dim(d)
    n_pad = max(align_up(max(n_valid, 1), tile_n), pad_rows_to)
    out = np.zeros((n_pad, d1), dtype=np.float32)
    rows = db
    if measure == DistanceMeasure.COSINE:
        norms = np.sqrt(np.einsum("nd,nd->n", db, db))
        rows = db / np.maximum(norms, 1e-30)[:, None]
    if shuffle_stride:
        pos = (np.arange(n, dtype=np.int64) * shuffle_stride) % max(n_valid, 1)
        out[pos[:n_valid], :d] = rows[:n_valid]
    else:
        out[:n, :d] = rows
    if measure == DistanceMeasure.SQUARED_L2:
        sq = np.einsum("nd,nd->n", db, db)
        if shuffle_stride:
            out[pos[:n_valid], d] = sq[:n_valid]
        else:
            out[:n, d] = sq
    out[n_valid:, d] = BLOCK_MASK_VALUE
    return out.astype(jnp.bfloat16)


def _encode_norm_digits(m: np.ndarray):
    """Non-negative ints -> three balanced base-128 digits in [-64, 63]."""
    d0 = ((m + 64) % 128) - 64
    c = (m - d0) // 128
    d1 = ((c + 64) % 128) - 64
    d2 = (c - d1) // 128
    return d0, d1, d2


def build_int8_augmented_db(db: np.ndarray, n_valid: int,
                            measure: DistanceMeasure, tile_n: int = 2048,
                            shuffle_stride: int = 0,
                            pad_rows_to: int = 0):
    """int8 sweep storage: HALF the bf16 stream bytes at near-equal recall.

    Returns ``(codes int8 [N_pad, D1], scales f32 [d], sn: float)``:

    - ``codes[:, :d]`` = per-dimension symmetric int8 (scale ``s_j =
      max|x_j| / 127``, folded into the query head at search time so the
      kernel is one int8->bf16 convert + the same MXU matmul);
    - ``codes[:, d:d+3]`` = the squared norm as base-128 digits (see
      INT8_NORM_DIGIT_MAX) for SQUARED_L2, zeros for dot/cosine;
    - padded/invalid rows carry the all-63 mask digits (decoded magnitude
      INT8_NORM_DIGIT_MAX * sn, >2.5x any real score — same sentinel role
      as BLOCK_MASK_VALUE in the bf16 layout).

    The norm digits live in lanes the (8,128) layout pads anyway (d=100 ->
    104 minor), so the norm costs zero extra bytes; its resolution sn/2 is
    ~200x finer than the bf16 layout's one-slot norm. Quantization noise in
    the -2q.x term is the only recall cost, recovered by the exact re-rank
    exactly as bf16 rounding is.
    """
    db = np.asarray(db, dtype=np.float32)
    n, d = db.shape
    d1 = align_up(d + 3, 8)
    n_pad = max(align_up(max(n_valid, 1), tile_n), pad_rows_to)
    rows = db
    if measure == DistanceMeasure.COSINE:
        norms = np.sqrt(np.einsum("nd,nd->n", db, db))
        rows = db / np.maximum(norms, 1e-30)[:, None]
    scales = np.abs(rows[:n_valid]).max(axis=0) / 127.0
    scales = np.maximum(scales, 1e-30).astype(np.float32)
    codes = np.zeros((n_pad, d1), dtype=np.int8)
    q = np.clip(np.rint(rows[:n_valid] / scales), -127, 127).astype(np.int8)
    if measure == DistanceMeasure.SQUARED_L2:
        sq = np.einsum("nd,nd->n", db[:n_valid], db[:n_valid])
        sn = float(2.0 ** np.ceil(np.log2(
            max(float(sq.max()), 1e-30) / INT8_NORM_REAL_MAX)))
        m = np.rint(sq / sn).astype(np.int64)
    else:
        # digits are zero for real rows; sn only scales the mask sentinel.
        # 512 puts the mask at ~5.3e8, the bf16 layout's 2^30-class margin.
        sn = 512.0
        m = np.zeros(n_valid, dtype=np.int64)
    g0, g1, g2 = _encode_norm_digits(m)
    if shuffle_stride:
        pos = (np.arange(n_valid, dtype=np.int64) * shuffle_stride) \
            % max(n_valid, 1)
    else:
        pos = np.arange(n_valid, dtype=np.int64)
    codes[pos, :d] = q
    codes[pos, d] = g0.astype(np.int8)
    codes[pos, d + 1] = g1.astype(np.int8)
    codes[pos, d + 2] = g2.astype(np.int8)
    # mask sentinel on padded rows (all-63 digits decode to DIGIT_MAX)
    mask_rows = np.ones(n_pad, dtype=bool)
    mask_rows[pos] = False
    codes[mask_rows, d:d + 3] = 63
    return codes, scales, sn


def int8_mask_cut(sn: float) -> float:
    """Validity threshold for int8-sweep block minima (mask sentinel / 2)."""
    return INT8_NORM_DIGIT_MAX * sn * 0.5


def _augment_queries_int8(queries: jnp.ndarray, measure: DistanceMeasure,
                          scales: jnp.ndarray, sn: float,
                          d1: int) -> jnp.ndarray:
    """[B, D1] bf16 query block matching ``build_int8_augmented_db``: the
    per-dim scales fold into the head; the three norm slots carry the
    base-128 multipliers (powers of two x sn -> exact in bf16)."""
    q = queries.astype(jnp.float32)
    b, d = q.shape
    if measure == DistanceMeasure.SQUARED_L2:
        head = -2.0 * q * scales
    elif measure == DistanceMeasure.COSINE:
        nq = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
        head = -(q / jnp.maximum(nq, 1e-30)) * scales
    elif measure in (DistanceMeasure.DOT_PRODUCT,
                     DistanceMeasure.GENERAL_INNER_PRODUCT):
        head = -q * scales
    else:
        raise ValueError(f"unsupported sweep measure {measure}")
    out = jnp.zeros((b, d1), jnp.float32)
    out = out.at[:, :d].set(head)
    out = out.at[:, d].set(sn)
    out = out.at[:, d + 1].set(128.0 * sn)
    out = out.at[:, d + 2].set(16384.0 * sn)
    return out.astype(jnp.bfloat16)


def _augment_queries(queries: jnp.ndarray, measure: DistanceMeasure,
                     d1: int) -> jnp.ndarray:
    """[B, D1] bf16 query block matching ``build_augmented_db``'s layout."""
    q = queries.astype(jnp.float32)
    b, d = q.shape
    if measure == DistanceMeasure.SQUARED_L2:
        head = -2.0 * q
    elif measure == DistanceMeasure.COSINE:
        nq = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
        head = -q / jnp.maximum(nq, 1e-30)
    elif measure in (DistanceMeasure.DOT_PRODUCT,
                     DistanceMeasure.GENERAL_INNER_PRODUCT):
        head = -q
    else:
        raise ValueError(f"unsupported sweep measure {measure}")
    out = jnp.zeros((b, d1), jnp.float32)
    out = out.at[:, :d].set(head)
    out = out.at[:, d].set(1.0)  # picks up the norm slot / mask sentinel
    return out.astype(jnp.bfloat16)


def _block_min_kernel(db_ref, q_ref, *refs, r: int):
    # int8 rows convert to bf16 in VMEM (no-op for bf16 rows); the matmul
    # stays hidden behind the halved HBM stream
    if len(refs) == 3:                             # (pen, vals, locs)
        pen_ref, vals_ref, locs_ref = refs
    else:
        pen_ref, (vals_ref, locs_ref) = None, refs
    scores = jax.lax.dot_general(
        db_ref[:].astype(jnp.bfloat16), q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [TN, B] f32
    tn, b = scores.shape
    s3 = scores.reshape(tn // r, r, b)
    if pen_ref is not None:
        # restrict allowlist as an additive per-row penalty (0 allowed /
        # BLOCK_MASK_VALUE denied), applied BEFORE the r:1 reduction so a
        # denied row can never occupy its block's candidate slot
        s3 = s3 + pen_ref[:].astype(jnp.float32)[:, :, None]
    vals_ref[:] = jnp.min(s3, axis=1)
    locs_ref[:] = jnp.argmin(s3, axis=1).astype(jnp.int32)


def _block_min_qmajor_kernel(db_ref, q_ref, *refs, r: int):
    """Block-min with query-major OUTPUT: the same contiguous r:1 reduction
    as the row-major kernel (major-dim reshape is layout-free), then an
    in-kernel transpose of the small [128, B] minima tile, so the block
    minima land in HBM as [B, N/r] — already the layout ``approx_min_k``
    wants. This removes the [N/r, B] -> [B, N/r] transpose the row-major
    kernel forces on the host program (a full read+write of the minima
    array, ~2 ms at B=1024, N=1.18M — measured round 3).

    Each grid step covers 128*r rows so the output tile is a full 128-lane
    block; blocks stay contiguous, so candidate reconstruction is the
    standard ``blk * r + loc``.
    """
    if len(refs) == 3:
        pen_ref, vals_ref, locs_ref = refs
    else:
        pen_ref, (vals_ref, locs_ref) = None, refs
    scores = jax.lax.dot_general(
        db_ref[:].astype(jnp.bfloat16), q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [STEP, B] f32
    tn, b = scores.shape
    s3 = scores.reshape(tn // r, r, b)
    if pen_ref is not None:
        s3 = s3 + pen_ref[:].astype(jnp.float32)[:, :, None]
    vals_ref[:] = jnp.min(s3, axis=1).T            # [B, 128]
    locs_ref[:] = jnp.argmin(s3, axis=1).astype(jnp.int32).T


def _block_min_qmajor_compact_kernel(db_ref, q_ref, *refs, r: int):
    """Q-major block-min with COMPACT minima: bf16 values + u8 within-block
    offsets (requires r <= 256). The minima arrays are pure HBM traffic —
    written by this kernel, then read once by ``approx_min_k`` — and at
    B=1024, N=1.18M they were 152 MB/batch as f32+i32, ~40% of the sweep's
    total stream. bf16+u8 cuts that to 57 MB. Precision: the bf16 rounding
    (rel. 2^-8) only perturbs the pre_k selection boundary; the exact f32
    re-rank restores all final distances (measured recall-neutral at
    pre_k=100, 1.18M — see BENCH_NOTES)."""
    if len(refs) == 3:
        pen_ref, vals_ref, locs_ref = refs
    else:
        pen_ref, (vals_ref, locs_ref) = None, refs
    scores = jax.lax.dot_general(
        db_ref[:].astype(jnp.bfloat16), q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [STEP, B] f32
    tn, b = scores.shape
    s3 = scores.reshape(tn // r, r, b)
    if pen_ref is not None:
        s3 = s3 + pen_ref[:].astype(jnp.float32)[:, :, None]
    vals_ref[:] = jnp.min(s3, axis=1).T.astype(jnp.bfloat16)
    locs_ref[:] = jnp.argmin(s3, axis=1).astype(jnp.uint8).T


def qmajor_step_rows(r: int) -> int:
    """Rows per q-major grid step: the minima block's lane dim must be a
    128-multiple, so each step covers 128 blocks = 128*r rows."""
    return 128 * r


# scores + iota intermediates per step: b * step * 8 bytes; cap well below
# v5e VMEM so the pipeline's in/out buffers still fit
_QMAJOR_VMEM_BYTES = 80 * 1024 * 1024


def qmajor_supported(n_rows: int, b: int, r: int) -> bool:
    step = qmajor_step_rows(r)
    return n_rows % step == 0 and b * step * 8 <= _QMAJOR_VMEM_BYTES


@functools.partial(jax.jit, static_argnames=("r", "interpret", "compact"))
def block_min_sweep_qmajor_pallas(
    q_aug: jnp.ndarray, db_aug: jnp.ndarray, r: int = 32,
    interpret: bool = False, compact: bool = False,
    penalty: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query-major-output sweep: returns (vals [B, N/r] f32, locs [B, N/r]
    int32 within-block offsets, contiguous blocks). Requires
    N % (128*r) == 0 — see ``qmajor_supported``. With ``compact=True``
    (needs r <= 256) the minima land as bf16 + u8 — one third of the
    f32+i32 HBM traffic; rank-equivalent up to bf16 rounding, which the
    exact re-rank absorbs. ``penalty`` ([N/r, r] bf16, 0 allowed /
    BLOCK_MASK_VALUE denied — see ``build_allow_penalty``) fuses a restrict
    allowlist into the pre-reduction scores (~1% extra stream bytes)."""
    b, d1 = q_aug.shape
    n = db_aug.shape[0]
    step = qmajor_step_rows(r)
    blk = pl.BlockSpec((b, 128), lambda i: (0, i), memory_space=pltpu.VMEM)
    if compact and r > 256:
        raise ValueError(f"compact q-major minima need r <= 256, got {r}")
    kern = (_block_min_qmajor_compact_kernel if compact
            else _block_min_qmajor_kernel)
    out_dtypes = ((jnp.bfloat16, jnp.uint8) if compact
                  else (jnp.float32, jnp.int32))
    in_specs = [
        pl.BlockSpec((step, d1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, d1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = (db_aug, q_aug)
    pen_bytes = 0
    if penalty is not None:
        in_specs.append(pl.BlockSpec((128, r), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args = (db_aug, q_aug, penalty)
        pen_bytes = n * penalty.dtype.itemsize
    return pl.pallas_call(
        functools.partial(kern, r=r),
        out_shape=(jax.ShapeDtypeStruct((b, n // r), out_dtypes[0]),
                   jax.ShapeDtypeStruct((b, n // r), out_dtypes[1])),
        grid=(cdiv(n, step),),
        in_specs=in_specs,
        out_specs=(blk, blk),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d1 * n,
            bytes_accessed=(d1 * n * db_aug.dtype.itemsize + pen_bytes
                            + (n // r) * b * (3 if compact else 8)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _block_min2_kernel(db_ref, q_ref, *refs, r: int):
    """Per-block (min, argmin) AND (2nd-min, 2nd-argmin) via a tournament
    tree — two same-block near-neighbors both survive to the re-rank,
    removing the one-candidate-per-block recall ceiling."""
    if len(refs) == 5:
        pen_ref, v1_ref, l1_ref, v2_ref, l2_ref = refs
    else:
        pen_ref, (v1_ref, l1_ref, v2_ref, l2_ref) = None, refs
    scores = jax.lax.dot_general(
        db_ref[:].astype(jnp.bfloat16), q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [TN, B] f32
    tn, b = scores.shape
    s3 = scores.reshape(tn // r, r, b)
    if pen_ref is not None:
        s3 = s3 + pen_ref[:].astype(jnp.float32)[:, :, None]
    iota = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)

    def _pairs(x):
        """[TB, m, b] -> ([TB, m/2, b], [TB, m/2, b]) via contiguous pairs
        (strided slices lower to unsupported gathers in mosaic; reshape +
        static index lowers to plain slices)."""
        tb, m, bb_ = x.shape
        x4 = x.reshape(tb, m // 2, 2, bb_)
        return x4[:, :, 0], x4[:, :, 1]

    # level 1: adjacent pairs -> (winner, loser)
    a, bb = _pairs(s3)
    ia, ib = _pairs(iota)
    ta = a <= bb
    m1, l1 = jnp.where(ta, a, bb), jnp.where(ta, ia, ib)
    m2, l2 = jnp.where(ta, bb, a), jnp.where(ta, ib, ia)
    # higher levels: merge (m1, m2) runs — the two smallest of the union
    # are min(m1a, m1b) and min(loser-of-that, m2a, m2b)
    while m1.shape[1] > 1:
        m1a, m1b = _pairs(m1)
        l1a, l1b = _pairs(l1)
        m2a, m2b = _pairs(m2)
        l2a, l2b = _pairs(l2)
        ta = m1a <= m1b
        m1 = jnp.where(ta, m1a, m1b)
        l1 = jnp.where(ta, l1a, l1b)
        mo = jnp.where(ta, m1b, m1a)             # the losing first-min
        lo = jnp.where(ta, l1b, l1a)
        t2 = m2a <= m2b
        c2 = jnp.where(t2, m2a, m2b)
        lc2 = jnp.where(t2, l2a, l2b)
        to = mo <= c2
        m2 = jnp.where(to, mo, c2)
        l2 = jnp.where(to, lo, lc2)
    v1_ref[:] = m1[:, 0]
    l1_ref[:] = l1[:, 0]
    v2_ref[:] = m2[:, 0]
    l2_ref[:] = l2[:, 0]


@functools.partial(jax.jit, static_argnames=("tile_n", "r", "interpret"))
def block_min_sweep_pallas(
    q_aug: jnp.ndarray, db_aug: jnp.ndarray, tile_n: int = 2048, r: int = 32,
    interpret: bool = False, penalty: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stream [N_pad, D1] bf16 rows, emit per-r-block (min, argmin).

    Returns (vals [N/r, B] f32, locs [N/r, B] int32). Runs at the DMA floor:
    the matmul+reduce hide entirely behind the HBM stream (measured).
    ``penalty``: optional [N/r, r] allowlist penalty (build_allow_penalty).
    """
    b, d1 = q_aug.shape
    n = db_aug.shape[0]
    in_specs = [
        pl.BlockSpec((tile_n, d1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, d1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = (db_aug, q_aug)
    if penalty is not None:
        in_specs.append(pl.BlockSpec((tile_n // r, r), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args = (db_aug, q_aug, penalty)
    return pl.pallas_call(
        functools.partial(_block_min_kernel, r=r),
        out_shape=(jax.ShapeDtypeStruct((n // r, b), jnp.float32),
                   jax.ShapeDtypeStruct((n // r, b), jnp.int32)),
        grid=(cdiv(n, tile_n),),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((tile_n // r, b), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile_n // r, b), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d1 * n,
            bytes_accessed=d1 * n * db_aug.dtype.itemsize + (n // r) * b * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("tile_n", "r", "interpret"))
def block_min2_sweep_pallas(
    q_aug: jnp.ndarray, db_aug: jnp.ndarray, tile_n: int = 2048, r: int = 32,
    interpret: bool = False, penalty: jnp.ndarray | None = None,
):
    """Like ``block_min_sweep_pallas`` but emits the TWO smallest per block:
    (v1, l1, v2, l2), each [N/r, B]. Doubles the (small) block-minima HBM
    writes; the db stream and matmul are unchanged."""
    b, d1 = q_aug.shape
    n = db_aug.shape[0]
    blk = pl.BlockSpec((tile_n // r, b), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tile_n, d1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, d1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = (db_aug, q_aug)
    if penalty is not None:
        in_specs.append(pl.BlockSpec((tile_n // r, r), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args = (db_aug, q_aug, penalty)
    return pl.pallas_call(
        functools.partial(_block_min2_kernel, r=r),
        out_shape=(jax.ShapeDtypeStruct((n // r, b), jnp.float32),
                   jax.ShapeDtypeStruct((n // r, b), jnp.int32),
                   jax.ShapeDtypeStruct((n // r, b), jnp.float32),
                   jax.ShapeDtypeStruct((n // r, b), jnp.int32)),
        grid=(cdiv(n, tile_n),),
        in_specs=in_specs,
        out_specs=(blk, blk, blk, blk),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d1 * n,
            bytes_accessed=d1 * n * db_aug.dtype.itemsize + (n // r) * b * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def build_allow_penalty(mask, n_pad: int, r: int, inv_perm=None,
                        mask_value: float = 4 * BLOCK_MASK_VALUE
                        ) -> np.ndarray:
    """Restrict allowlist -> [N_pad/r, r] bf16 additive penalty for the
    sweep kernels: 0 for allowed rows, ``mask_value`` for denied ones, in
    the sweep's STORED row order. ``inv_perm`` maps stored position ->
    original point id (the shuffle's inverse table; None = identity).
    Padding rows get 0 — their augmented norm slot already carries the mask
    sentinel. ~N*2 bytes of extra kernel stream (≈1% of the bf16 rows).

    ``mask_value`` defaults to 4x the bf16 layout's sentinel so a denied
    row's penalized score clears the validity cut even if its raw score is
    strongly negative; int8-layout callers pass 4 * INT8_NORM_DIGIT_MAX *
    sn, which scales with the data exactly as that layout's sentinel does."""
    mask = np.asarray(mask, dtype=bool)
    n = mask.shape[0]
    pen = np.zeros(n_pad, np.float32)
    stored = mask if inv_perm is None else mask[np.asarray(inv_perm)]
    pen[:n] = np.where(stored, 0.0, mask_value)
    return pen.reshape(n_pad // r, r).astype(jnp.bfloat16)


def sweep_block_candidates(q_aug, db_aug, *, pre_k: int, r: int, tile_n: int,
                           interpret: bool, penalty=None,
                           top2: bool = False):
    """Block-min sweep over (a shard block of) the augmented rows ->
    (pv [B, pre_k] raw sweep scores f32, cand [B, pre_k] int32 local row
    indices). Picks the transpose-free q-major kernel when supported (TPU
    serving path), else the row-major + transpose formulation. Shared by
    the single-device pipeline and the sharded wrapper's shard body.

    ``top2=True`` keeps the TWO smallest per selected block (tournament
    kernel), returning [B, 2*pre_k] pv/cand — removes the
    one-candidate-per-block collision ceiling at the cost of doubled
    block-minima writes and re-rank width."""
    if top2:
        v1, l1, v2, l2 = block_min2_sweep_pallas(
            q_aug, db_aug, tile_n=tile_n, r=r, interpret=interpret,
            penalty=penalty)
        pv1, blk = approx_top_k_smallest(v1.T, pre_k)    # [B, pre_k]
        loc1 = jnp.take_along_axis(l1.T, blk, axis=1)
        pv2 = jnp.take_along_axis(v2.T, blk, axis=1)
        loc2 = jnp.take_along_axis(l2.T, blk, axis=1)
        pv = jnp.concatenate([pv1, pv2], axis=1)         # [B, 2*pre_k]
        cand = jnp.concatenate([blk * r + loc1, blk * r + loc2], axis=1)
        return pv, cand
    if not interpret and qmajor_supported(db_aug.shape[0],
                                          q_aug.shape[0], r):
        # TPU path only: XLA:CPU (interpret mode) miscompiles the fold
        # program at some batch shapes (compile-time CHECK crash / hang,
        # jax 0.8 era); CPU tests cover q-major via the kernel-level
        # parity test and take the row-major path here.
        compact = r <= 256
        vals, locs = block_min_sweep_qmajor_pallas(
            q_aug, db_aug, r=r, interpret=interpret, compact=compact,
            penalty=penalty)
        pv, blk = approx_top_k_smallest(vals, pre_k)     # [B, pre_k]
        pv = pv.astype(jnp.float32)
        local = jnp.take_along_axis(locs, blk, axis=1).astype(jnp.int32)
        cand = blk * r + local                           # global point ids
    else:
        vals, locs = block_min_sweep_pallas(q_aug, db_aug, tile_n=tile_n,
                                            r=r, interpret=interpret,
                                            penalty=penalty)
        pv, blk = approx_top_k_smallest(vals.T, pre_k)   # [B, pre_k]
        local = jnp.take_along_axis(locs.T, blk, axis=1)
        cand = blk * r + local                           # global point ids
    return pv, cand


def sweep_approx_in_measure_units(pv, queries, measure: DistanceMeasure):
    """Sweep scores -> the measure's own units (for pre_eps compares):
    L2 adds ||q||^2 (pv = ||x||^2 - 2 q.x), cosine adds 1 (pv = -cos)."""
    if measure == DistanceMeasure.SQUARED_L2:
        q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1)
        return pv + q_sq[:, None]
    if measure == DistanceMeasure.COSINE:
        return 1.0 + pv
    return pv


@functools.partial(jax.jit, static_argnames=("pre_k", "k", "measure", "r",
                                             "tile_n", "interpret", "top2",
                                             "aug_sn"))
def sweep_search_kernel(
    db_aug, db, db_sq_norms, n_valid, queries,
    pre_eps=jnp.inf, post_eps=jnp.inf, inv_perm=None, aug_scales=None,
    allow_pen=None,
    *, pre_k: int, k: int,
    measure: DistanceMeasure, r: int = 32, tile_n: int = 2048,
    interpret: bool = False, top2: bool = False, aug_sn: float = 0.0,
):
    """Full pipeline: block-min sweep -> approx top-pre_k over block
    minima -> exact f32 re-rank -> top-k. One device program.

    ``db_aug`` is either the bf16 layout (build_augmented_db) or the int8
    layout (build_int8_augmented_db, half the stream bytes); for int8 pass
    ``aug_scales`` ([d] f32) and ``aug_sn`` (static float) so the query
    head folds the per-dim scales and the norm-digit multipliers.

    pre_eps filters on the sweep's (rank-equivalent) approximate distances,
    post_eps on exact re-ranked distances — SearchParameters semantics
    (reference: src/searcher.rs:12-30).

    top2=True re-ranks the two smallest per selected block, removing the
    one-candidate-per-block collision ceiling (~0.998 recall@10 at 1.18M)
    at the cost of doubled block-minima writes and re-rank width.

    ``allow_pen`` ([N_pad/r, r] from ``build_allow_penalty``) fuses a
    restrict allowlist into the pre-reduction scores, so denied rows can
    never shadow allowed ones inside a block — exact filter semantics at
    any selectivity (reference: tree_x_hybrid/mod.rs:297-339 applies the
    filter before scoring each point).
    """
    d1 = db_aug.shape[1]
    if db_aug.dtype == jnp.int8:
        q_aug = _augment_queries_int8(queries, measure, aug_scales, aug_sn,
                                      d1)
        mask_cut = int8_mask_cut(aug_sn)
    else:
        q_aug = _augment_queries(queries, measure, d1)
        mask_cut = BLOCK_MASK_VALUE / 2
    pv, cand = sweep_block_candidates(q_aug, db_aug, pre_k=pre_k, r=r,
                                      tile_n=tile_n, interpret=interpret,
                                      penalty=allow_pen, top2=top2)

    # approximate distance in the measure's own units for pre_eps
    approx = sweep_approx_in_measure_units(pv, queries, measure)
    pre_valid = (pv < mask_cut) & (approx <= pre_eps)

    from scann_tpu.utils.reordering import (
        gather_rerank_rows,
        rerank_store_rows,
    )

    safe = jnp.clip(cand, 0, rerank_store_rows(db) - 1)
    rows = gather_rerank_rows(db, safe)                  # [B, pre_k, D]
    # norms recomputed from the gathered rows (identical math to the
    # table; per-element norm gathers cost ~20 ns each on TPU)
    norms = jnp.sum(rows * rows, axis=-1)
    exact = gathered_distances(measure, queries, rows, norms)
    exact = jnp.where(pre_valid, exact, MASKED_DISTANCE)
    out_vals, pos = top_k_smallest(exact, k)
    idx = jnp.take_along_axis(cand, pos, axis=1)
    if inv_perm is not None:
        # stored positions are (id * stride) % n_valid; the rerank store
        # is laid out in the SAME permuted order, so true ids resolve only
        # for the k winners — a [B, k] gather instead of [B, pre_k]
        # (per-element gathers cost ~20 ns each on TPU; at pre_k=100,
        # B=1024 the pre-gather translation was ~2 ms of a ~8 ms batch)
        idx = jnp.take(inv_perm, jnp.clip(idx, 0, inv_perm.shape[0] - 1),
                       axis=0)
    missing = (out_vals >= MASKED_DISTANCE / 2) | (out_vals > post_eps)
    return (jnp.where(missing, jnp.inf, out_vals),
            jnp.where(missing, -1, idx))
