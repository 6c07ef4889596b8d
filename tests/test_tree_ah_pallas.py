"""CSR leaf-scoring Pallas kernel vs jnp oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scann_tpu.ops.tree_ah_pallas import tree_ah_leaf_scores_pallas
from scann_tpu.types import MASKED_DISTANCE


def test_csr_leaf_scores_match_oracle(rng):
    b, p, s, c, l_cap = 3, 4, 8, 16, 64
    n_parts = 10
    # build a CSR code table with ragged partition sizes <= l_cap
    sizes_all = rng.integers(5, l_cap, size=n_parts)
    offsets_all = np.zeros(n_parts + 1, np.int32)
    np.cumsum(sizes_all, out=offsets_all[1:])
    n = int(offsets_all[-1])
    codes = rng.integers(0, c, size=(n + l_cap, s)).astype(np.uint8)  # + pad rows

    parts = rng.integers(0, n_parts, size=(b, p))
    offsets = offsets_all[parts].astype(np.int32)
    sizes = sizes_all[parts].astype(np.int32)
    luts = rng.uniform(0, 4, size=(b, p, s, c)).astype(np.float32)

    got = np.asarray(tree_ah_leaf_scores_pallas(
        jnp.asarray(luts), jnp.asarray(codes.T.copy()), jnp.asarray(offsets),
        jnp.asarray(sizes), l_cap=l_cap, interpret=True))

    for bi in range(b):
        for pi in range(p):
            off, sz = offsets[bi, pi], sizes[bi, pi]
            blk = codes[off : off + sz].astype(int)
            want = luts[bi, pi][np.arange(s)[None, :], blk].sum(-1)
            np.testing.assert_allclose(got[bi, pi, :sz], want, rtol=3e-3, atol=3e-3)
            assert (got[bi, pi, sz:] >= MASKED_DISTANCE / 2).all()


def test_csr_leaf_scores_full_partitions(rng):
    """Partitions exactly l_cap sized: no masking, all real scores."""
    b, p, s, c, l_cap = 2, 2, 4, 16, 32
    codes = rng.integers(0, c, size=(4 * l_cap + l_cap, s)).astype(np.uint8)
    offsets = np.array([[0, l_cap], [2 * l_cap, 3 * l_cap]], np.int32)
    sizes = np.full((b, p), l_cap, np.int32)
    luts = rng.uniform(0, 2, size=(b, p, s, c)).astype(np.float32)
    got = np.asarray(tree_ah_leaf_scores_pallas(
        jnp.asarray(luts), jnp.asarray(codes.T.copy()), jnp.asarray(offsets),
        jnp.asarray(sizes), l_cap=l_cap, interpret=True))
    assert (got < MASKED_DISTANCE / 2).all()
    blk = codes[l_cap : 2 * l_cap].astype(int)
    want = luts[0, 1][np.arange(s)[None, :], blk].sum(-1)
    np.testing.assert_allclose(got[0, 1], want, rtol=3e-3, atol=3e-3)
