"""Pallas bit-deposit kernel vs the XLA scatter reference (interpret mode).

The TPU path (ops/bitpack.py scatter_bits_tpu) must produce the byte-exact
stream of scatter_bits for any unit mix, including zero-width units, long
runs of tiny units, and tile-boundary word sharing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fpng_tpu.ops.bitpack import (
    exclusive_offsets,
    scatter_bits,
    scatter_bits_tpu,
)


@pytest.mark.parametrize("seed,n", [(0, 37), (1, 1024), (2, 5000),
                                    (3, 16384), (4, 20000)])
def test_deposit_matches_scatter(seed, n):
    rng = np.random.default_rng(seed)
    B = 3
    nbits = rng.integers(0, 19, (B, n)).astype(np.int32)
    # sprinkle zero-width units and runs of 1-bit units
    nbits[:, rng.integers(0, n, n // 4)] = 0
    nbits[:, : n // 8] = 1
    vals = (rng.integers(0, 1 << 31, (B, n)).astype(np.uint32)
            & ((1 << nbits.astype(np.uint32)) - 1))
    base = rng.integers(8, 1200, B).astype(np.int32)
    offs = np.asarray(exclusive_offsets(jnp.asarray(nbits),
                                        jnp.asarray(base)))
    total = offs[:, -1] + nbits[:, -1]
    num_words = int((total.max() + 31) // 32 + 2)
    a = np.asarray(scatter_bits(jnp.asarray(vals), jnp.asarray(nbits),
                                jnp.asarray(offs), num_words))
    b = np.asarray(scatter_bits_tpu(jnp.asarray(vals), jnp.asarray(nbits),
                                    jnp.asarray(offs), num_words,
                                    interpret=True))
    for i in range(B):
        nw = int((total[i] + 31) // 32)
        assert np.array_equal(a[i, :nw], b[i, :nw])


def test_deposit_with_gaps_zero_init():
    """Decode-style records: sorted offsets with large gaps, zero-width
    duplicates, and trailing sentinels; gap words must read as zero."""
    rng = np.random.default_rng(7)
    B, n, total = 2, 6000, 50000
    outp = np.sort(rng.integers(0, total, (B, n)))
    lit = rng.random((B, n)) < 0.4
    sym = rng.integers(0, 256, (B, n))
    vals = np.where(lit, sym | 0x100, 0).astype(np.uint32)
    nbits = np.where(lit, 16, 0).astype(np.int32)
    for b in range(B):  # literal offsets must be unique
        seen = np.zeros(total + 1, bool)
        for i in range(n):
            if nbits[b, i] and seen[outp[b, i]]:
                vals[b, i] = 0
                nbits[b, i] = 0
            seen[outp[b, i]] = True
    offs = (outp * 16).astype(np.int32)
    nw = (16 * (total + 1)) // 32 + 2
    a = np.asarray(scatter_bits(jnp.asarray(vals), jnp.asarray(nbits),
                                jnp.asarray(offs), nw))
    b_ = np.asarray(scatter_bits_tpu(jnp.asarray(vals), jnp.asarray(nbits),
                                     jnp.asarray(offs), nw, interpret=True,
                                     zero_init=True))
    assert np.array_equal(a, b_)
