"""Device-side PNG container assembly.

The reference does its container work (header bytes, prefix splice, IDAT
CRC32, IEND) on the host inside its headline MPix/s (fpng.cpp:1766-1800).
Our encode kernels got ~7x faster than that host tail, so on a one-core
host the container work must ride the device too: this module turns the
encode kernel's (words, total_bits, adler) outputs into COMPLETE PNG byte
arenas on device — prefix splice, variable-offset adler deposit, IDAT
CRC-32 (GF(2) tree + per-image variable inverse shift), CRC/IEND tail
deposit — so host assembly collapses to one slice per image.

Layout per image (all offsets fixed except the tail):
  [0:50)    batch-constant header (PNG sig + IHDR + fdEC), host-computed
  [50:54)   BE32 IDAT chunk length = tb + 4           (tb = payload bytes)
  [54:58)   "IDAT"
  [58:58+tb)      deflate stream (prefix-spliced device words)
  [58+tb:...+4)   BE32 adler of the filtered stream
  [...:+4)        BE32 IDAT CRC-32 (covers bytes [54 : 58+tb+4))
  [...:+12)       IEND chunk (constant)
Total length = tb + 78.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .checksum import crc32_bytes_var

_IEND12 = np.frombuffer(
    b"\x00\x00\x00\x00IEND\xaeB`\x82", np.uint8).astype(np.int32)
_IDAT4 = np.frombuffer(b"IDAT", np.uint8).astype(np.int32)

PREFIX_PAD = 640  # > worst-case dynamic header (316 syms x 14 bits)


def _be32_bytes(v: jnp.ndarray) -> jnp.ndarray:
    """(B,) uint32 -> (B, 4) int32 big-endian bytes."""
    sh = jnp.uint32(8) * (3 - jnp.arange(4, dtype=jnp.uint32))[None, :]
    return ((v[:, None] >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)


def assemble_arena(words, total_bits, adler, prefix_u8, plens, hdr50_u8):
    """Build complete PNGs around device deflate payloads.

    words:     (B, NW) uint32 little-endian payload buffers
    total_bits:(B,)    deflate stream length in bits (incl. spliced prefix)
    adler:     (B,)    uint32 adler32 of the filtered stream
    prefix_u8: (B, P)  zero-padded serialized header prefixes
    plens:     (B,)    true prefix byte lengths
    hdr50_u8:  (50,)   batch-constant container header bytes
    Returns (arena (B, 78 + 4*NW) uint8, png_lens (B,) int32).  Images that
    need the stored-block fallback (budget overflow) produce garbage arenas;
    the caller decides via (total_bits, last_tok) exactly like the host
    assembler (fpng.cpp:1728-1758) and replaces those entries.
    """
    B, NW = words.shape
    N = NW * 4
    P = prefix_u8.shape[1]
    tb = ((total_bits.astype(jnp.int32) + 7) >> 3)  # (B,) payload bytes

    # words -> bytes (LE), int32 lanes
    sh = jnp.uint32(8) * jnp.arange(4, dtype=jnp.uint32)[None, None, :]
    body = ((words[:, :, None] >> sh) & jnp.uint32(0xFF)) \
        .astype(jnp.int32).reshape(B, N)

    # prefix splice over the head region
    pe = min(P, N)
    head = jnp.where(jnp.arange(pe, dtype=jnp.int32)[None, :]
                     < plens.astype(jnp.int32)[:, None],
                     prefix_u8[:, :pe].astype(jnp.int32), body[:, :pe])
    body = jnp.concatenate([head, body[:, pe:]], axis=1)

    # The 20-byte tail lands at [tb, tb+20); tb can reach budget-4 while
    # N = budget+14 (num_words rounds budget//4 down, budget = 6 mod 8), so
    # without padding the last 1-2 IEND bytes would be clipped off the
    # arena.  Pad the body so the tail always fits.
    body = jnp.concatenate([body, jnp.zeros((B, 20), jnp.int32)], axis=1)
    N = N + 20

    # mask tail + deposit the 20 trailing bytes (adler, crc placeholder 0,
    # IEND) at the per-image offset in one clipped gather
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    rel = idx - tb[:, None]
    adler_b = _be32_bytes(adler)                           # (B, 4)
    tail20 = jnp.concatenate(
        [adler_b, jnp.zeros((B, 4), jnp.int32),
         jnp.broadcast_to(jnp.asarray(_IEND12)[None, :], (B, 12))], axis=1)
    # (B, N)-indexed gathers are pathological on TPU (~260ms each at this
    # size); a 20-way select chain fuses into one elementwise pass.
    tsel = jnp.zeros_like(body)
    for t in range(20):
        tsel = jnp.where(rel == t, tail20[:, t:t + 1], tsel)
    body = jnp.where(rel < 0, body, tsel)

    # IDAT CRC over "IDAT" + payload + adler = bytes [54 : 58+tb+4).
    # body currently holds payload+adler then zeros from rel=4 on, except
    # the deposited IEND bytes — mask those off for the CRC input.
    crc_body = jnp.where(rel >= 4, 0, body)
    crc_in = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(_IDAT4)[None, :], (B, 4)), crc_body],
        axis=1)
    idat_crc = crc32_bytes_var(crc_in, tb + 8)             # len = 4+tb+4

    # deposit the CRC bytes at rel in [4, 8)
    crc_b = _be32_bytes(idat_crc)
    for t in range(4):
        body = jnp.where(rel == 4 + t, crc_b[:, t:t + 1], body)

    hdr = jnp.broadcast_to(
        hdr50_u8.astype(jnp.int32)[None, :], (B, 50))
    idat_len = _be32_bytes((tb + 4).astype(jnp.uint32))
    idat_tag = jnp.broadcast_to(jnp.asarray(_IDAT4)[None, :], (B, 4))
    arena = jnp.concatenate([hdr, idat_len, idat_tag, body], axis=1)
    return arena.astype(jnp.uint8), tb + 78
