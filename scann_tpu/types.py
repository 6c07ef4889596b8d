"""Shared numeric/type helpers for TPU-friendly layouts.

The reference pads rows to 64-byte cache lines for AVX2
(reference: src/types.rs:285-297, src/data_format/dataset.rs:89-96).
On TPU the analogous constraints are the (sublane, lane) tiles of the
vector registers — f32 tiles are (8, 128) — so we pad the row count to a
sublane multiple and keep a validity count, masking padded rows out of
every scoring program.
"""

from __future__ import annotations

import numpy as np

# TPU vreg tiling (see pallas guide): last dim 128 lanes, sublane count by dtype.
LANE = 128
SUBLANE_F32 = 8
SUBLANE_BF16 = 16
SUBLANE_I8 = 32

# Sentinel distance for masked-out (padded / filtered) points. Using a large
# finite value instead of +inf keeps top_k well-defined and avoids NaN from
# inf-inf arithmetic in fused score transforms.
MASKED_DISTANCE = np.float32(3.4e38) / 2


def align_up(x: int, alignment: int) -> int:
    """Round ``x`` up to a multiple of ``alignment`` (reference: src/types.rs:285-290)."""
    if alignment <= 0:
        raise ValueError(f"alignment must be positive, got {alignment}")
    return ((x + alignment - 1) // alignment) * alignment


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def is_tpu() -> bool:
    """True when the default JAX backend is a real TPU — the ONE platform
    probe every kernel-dispatch decision (Pallas vs XLA, interpret mode)
    shares."""
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def pad_rows(arr: np.ndarray, multiple: int, fill=0) -> np.ndarray:
    """Pad the leading dimension of ``arr`` up to a multiple of ``multiple``."""
    n = arr.shape[0]
    n_pad = align_up(max(n, 1), multiple)
    if n_pad == n:
        return arr
    pad_widths = [(0, n_pad - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_widths, constant_values=fill)
