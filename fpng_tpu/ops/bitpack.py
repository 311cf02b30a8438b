"""Parallel variable-length bitstream packing.

The reference's sequential 64-bit accumulator (PUT_BITS*, fpng.cpp:564-588)
becomes: per-unit (value, nbits) pairs -> exclusive prefix-sum of nbits ->
each unit's bits split into (word, word+1) 32-bit contributions -> two
scatter-adds.  Units never share bits, so add == or and duplicate word
indices combine correctly.
"""

from __future__ import annotations

import jax.numpy as jnp


def exclusive_offsets(nbits: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Per-unit start bit offsets: base + exclusive cumsum along axis 1."""
    inc = jnp.cumsum(nbits, axis=1, dtype=jnp.int32)
    return base[:, None] + (inc - nbits)


def scatter_bits(vals: jnp.ndarray, nbits: jnp.ndarray, offsets: jnp.ndarray,
                 num_words: int) -> jnp.ndarray:
    """Pack (B, N) units into (B, num_words) little-endian uint32 words.

    vals must be uint32 with at most `nbits` significant bits; offsets are
    absolute bit positions.  Out-of-range words are dropped (callers detect
    overflow via total bit counts and fall back to stored blocks).
    """
    word = (offsets >> 5).astype(jnp.int32)
    sh = (offsets & 31).astype(jnp.uint32)
    lo = vals << sh
    hi = (vals >> jnp.uint32(1)) >> (jnp.uint32(31) - sh)  # avoids shift-by-32

    out = jnp.zeros((vals.shape[0], num_words), jnp.uint32)
    out = out.at[jnp.arange(vals.shape[0])[:, None], word].add(
        lo, mode="drop")
    out = out.at[jnp.arange(vals.shape[0])[:, None], word + 1].add(
        hi, mode="drop")
    return out
