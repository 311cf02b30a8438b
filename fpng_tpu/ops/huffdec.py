"""Data-parallel Huffman decode primitives.

The reference decodes sequentially through a 12-bit LUT (fpng.cpp:2209-2901).
The TPU reformulation exploits that the *bit-length* of every token is a
pure function of the 12 bits at its start: compute the next-token-position
function for every bit offset in parallel, then extract the actual token
chain by pointer doubling (log2(K) batched gathers).  EOB and invalid codes
are fixpoints, so the chain self-terminates and post-EOB slots are inert.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as C

_LEN_EXTRA_BY_SYM = jnp.asarray(C.LEN_EXTRA_BY_SYM, jnp.int32)
_LEN_BASE_BY_SYM = jnp.asarray(C.LEN_BASE_BY_SYM, jnp.int32)


def peek_bits(stream: jnp.ndarray, pos: jnp.ndarray, width: int = 12):
    """LSB-first peek of `width` (<=16) bits at arbitrary bit positions.

    stream: (B, Nb) uint8 (zero padding past the true stream is fine);
    pos: (B, ...) int32 bit offsets.  Out-of-range reads see zeros.
    """
    Nb = stream.shape[1]
    s32 = stream.astype(jnp.int32)
    byte = pos >> 3
    i0 = jnp.clip(byte, 0, Nb - 1)
    i1 = jnp.clip(byte + 1, 0, Nb - 1)
    i2 = jnp.clip(byte + 2, 0, Nb - 1)
    b0 = jnp.take_along_axis(s32, i0.reshape(s32.shape[0], -1), axis=1)
    b1 = jnp.take_along_axis(s32, i1.reshape(s32.shape[0], -1), axis=1)
    b2 = jnp.take_along_axis(s32, i2.reshape(s32.shape[0], -1), axis=1)
    # guard the clip aliasing: bytes past Nb must read as zero
    z0 = (byte.reshape(b0.shape) < Nb)
    z1 = (byte.reshape(b0.shape) + 1 < Nb)
    z2 = (byte.reshape(b0.shape) + 2 < Nb)
    b0 = jnp.where(z0, b0, 0)
    b1 = jnp.where(z1, b1, 0)
    b2 = jnp.where(z2, b2, 0)
    word = b0 | (b1 << 8) | (b2 << 16)
    out = (word >> (pos.reshape(b0.shape) & 7)) & ((1 << width) - 1)
    return out.reshape(pos.shape)


def token_fields(lut: jnp.ndarray, stream: jnp.ndarray, pos: jnp.ndarray):
    """Decode LUT fields at bit positions: (sym, code_len, tok_bits).

    tok_bits includes length-extra bits and the 1-bit distance code for
    match symbols; 0-length (invalid) and EOB entries get tok_bits such
    that callers can fixpoint them.
    """
    pk = peek_bits(stream, pos, C.DECODER_TABLE_BITS)
    e = jnp.take_along_axis(lut, pk.reshape(lut.shape[0], -1),
                            axis=1).reshape(pos.shape).astype(jnp.int32)
    sym = e & 511
    clen = (e >> 9) & 15
    is_match = (sym > 256) & (sym <= 285)
    extra = jnp.where(is_match,
                      _LEN_EXTRA_BY_SYM[jnp.clip(sym - 257, 0, 28)] + 1, 0)
    return sym, clen, clen + extra


def next_fn(lut: jnp.ndarray, stream: jnp.ndarray, n_bits: int):
    """next[p] for every bit position p: start of the following token.

    EOB and invalid codes map to themselves (fixpoints).
    """
    B = stream.shape[0]
    pos = jnp.broadcast_to(jnp.arange(n_bits, dtype=jnp.int32)[None, :],
                           (B, n_bits))
    sym, clen, tok_bits = token_fields(lut, stream, pos)
    stop = (clen == 0) | (sym == 256)
    nxt = jnp.where(stop, pos, jnp.minimum(pos + tok_bits, n_bits - 1))
    return nxt


def token_chain(nxt: jnp.ndarray, p0: jnp.ndarray, k: int) -> jnp.ndarray:
    """Positions of the first k tokens starting from p0, via doubling.

    nxt: (B, N) successor function; p0: (B,) start bits.
    Returns (B, k) int32 token start positions (post-EOB slots repeat the
    EOB position).
    """
    B = nxt.shape[0]
    P = p0[:, None].astype(jnp.int32)
    jump = nxt
    filled = 1
    while filled < k:
        take = min(filled, k - filled)
        nxt_pos = jnp.take_along_axis(jump, P[:, :take], axis=1)
        P = jnp.concatenate([P, nxt_pos], axis=1)
        filled += take
        if filled < k:
            jump = jnp.take_along_axis(jump, jump, axis=1)
    return P


def match_run_lengths(lut, stream, pos, sym, clen):
    """Decoded run length (bytes) for match tokens (garbage elsewhere)."""
    idx = jnp.clip(sym - 257, 0, 28)
    base = _LEN_BASE_BY_SYM[idx]
    nextra = _LEN_EXTRA_BY_SYM[idx]
    ev = peek_bits(stream, pos + clen, 5) & ((1 << nextra) - 1)
    return base + ev
