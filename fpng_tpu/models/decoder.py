"""Batched TPU decoder pipeline.

Host does the O(1)-per-image work (container chunk walk, dynamic-header
parse + 12-bit LUT build, exactly as the reference's prepare_dynamic_block,
fpng.cpp:1954-2105); the device does everything O(pixels):

  next-position function over all bit offsets -> token chain extraction by
  pointer doubling -> per-token validation (filter structure, match
  alignment/caps, EOB placement, stream end position) -> literal scatter +
  per-row RLE forward-fill -> defilter cumsum -> pixels.

Any constraint violation flips the per-image ok flag and the API reports
FPNG_DECODE_NOT_FPNG, mirroring the reference's accept/reject semantics.
"""

from __future__ import annotations

import functools

# Flipped once the chunk-speculative decode path makes device decode
# throughput competitive; bench.py gates on it.
BENCH_READY = False

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops.huffdec import (
    match_run_lengths,
    next_fn,
    peek_bits,
    token_chain,
    token_fields,
)


@functools.partial(jax.jit, static_argnames=("h", "w", "c", "n_bits"))
def decode_kernel(stream, lut, p0, zlib_len, *, h: int, w: int, c: int,
                  n_bits: int):
    """Device decode of B same-shape fpng streams.

    stream: (B, Nb) uint8 zlib payloads (starting at the zlib header),
    zero-padded; lut: (B, 4096) uint32; p0: (B,) first token bit position
    (after the dynamic block header); zlib_len: (B,) IDAT lengths.
    Returns (imgs (B,h,w,c) uint8, ok (B,) bool).
    """
    B = stream.shape[0]
    bpl = w * c
    row_stride = 1 + bpl
    total = h * row_stride
    K = total + 2

    nxt = next_fn(lut, stream, n_bits)
    P = token_chain(nxt, p0, K)
    sym, clen, _tok_bits = token_fields(lut, stream, P)

    valid_tok = clen > 0
    is_eob = (sym == 256) & valid_tok
    is_match = (sym > 256) & valid_tok
    is_lit = (sym < 256) & valid_tok

    run = match_run_lengths(lut, stream, P, sym, clen)
    out_len = jnp.where(is_lit, 1, jnp.where(is_match, run, 0))
    cum = jnp.cumsum(out_len, axis=1, dtype=jnp.int32)
    out_off = cum - out_len
    active = out_off < total

    # --- validation ---------------------------------------------------------
    rowpos = out_off % row_stride
    row = out_off // row_stride
    x = rowpos - 1  # byte offset within the row's pixel area

    ok = jnp.all(~active | valid_tok, axis=1)
    ok &= jnp.all(~active | ~is_eob, axis=1)
    # filter positions must be literal tokens with value 0 (row 0) / 2
    at_filter = active & (rowpos == 0)
    fexp = jnp.where(row > 0, 2, 0)
    ok &= jnp.all(~at_filter | (is_lit & (sym == fexp)), axis=1)
    # match constraints: pixel-aligned, multiple of c, within the row
    mt = active & is_match
    ok &= jnp.all(~mt | ((rowpos >= 1) & (x % c == 0) & (run % c == 0) &
                         (x + run <= bpl)), axis=1)
    # non-pixel-aligned positions must be literals (pixel bytes 1..c-1)
    misaligned = active & (rowpos >= 1) & (x % c != 0)
    ok &= jnp.all(~misaligned | is_lit, axis=1)
    # termination: the first token at offset `total` is EOB
    ok &= jnp.any((out_off == total) & is_eob, axis=1)
    # stream end: EOB's end, byte aligned, must sit at zlib_len - 4
    eob_pos = P[:, -1]
    _, eob_len, _ = token_fields(lut, stream, eob_pos[:, None])
    end_bits = eob_pos + eob_len[:, 0]
    ok &= ((end_bits + 7) >> 3) == (zlib_len - 4)

    # --- byte expansion ------------------------------------------------------
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    lit_idx = jnp.where(active & is_lit, out_off, total)  # OOB -> dropped
    flat = jnp.zeros((B, total + 1), jnp.int32)
    flat = flat.at[bidx, lit_idx].set(sym, mode="drop")
    lmask = jnp.zeros((B, total + 1), jnp.bool_)
    lmask = lmask.at[bidx, lit_idx].set(True, mode="drop")

    vals = flat[:, :total].reshape(B, h, row_stride)[:, :, 1:] \
        .reshape(B, h, w, c)
    plit = lmask[:, :total].reshape(B, h, row_stride)[:, :, 1:] \
        .reshape(B, h, w, c)[..., 0]

    # forward-fill match pixels from the last literal pixel in the row
    # (implicit zero pixel before x=0, matching the reference's per-row
    # prev_delta initialization)
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    last_lit = jax.lax.cummax(jnp.where(plit, xs, -1), axis=2)
    gather_idx = jnp.clip(last_lit, 0, w - 1)
    deltas = jnp.take_along_axis(
        vals, gather_idx[..., None].repeat(c, axis=3), axis=2)
    deltas = jnp.where((last_lit >= 0)[..., None], deltas, 0)

    imgs = jnp.cumsum(deltas, axis=1).astype(jnp.uint8)
    return imgs, ok


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


def _parse_one(png: bytes):
    """Container + header parse for one file.

    Returns (status, w, h, ch, stream_bytes, p0_bits, zlib_len, lut) -
    lut None => host fallback needed (stored blocks) or reject.
    """
    from ..bitio import BitReader
    from ..container import get_info_internal
    from ..golden import _parse_dynamic_header

    status, w, h, ch, idat_ofs, idat_len = get_info_internal(png)
    if status != C.FPNG_DECODE_SUCCESS:
        return status, w, h, ch, None, 0, 0, None
    src = png[idat_ofs + 8:]
    if idat_len < 7 or len(src) < 3 or src[0] != C.ZLIB_HDR0 or \
            src[1] != C.ZLIB_HDR1:
        return C.FPNG_DECODE_NOT_FPNG, w, h, ch, None, 0, 0, None
    if (src[2] & 6) == 0:  # stored blocks: host path
        return C.FPNG_DECODE_SUCCESS, w, h, ch, src, -1, idat_len, None
    r = BitReader(src)
    r.skip(16)
    if r.get(1) != 1 or r.get(2) != 2:
        return C.FPNG_DECODE_NOT_FPNG, w, h, ch, None, 0, 0, None
    lut = _parse_dynamic_header(r, ch)
    if lut is None:
        return C.FPNG_DECODE_NOT_FPNG, w, h, ch, None, 0, 0, None
    return (C.FPNG_DECODE_SUCCESS, w, h, ch, src, r.bit_pos, idat_len,
            lut)


def decode_batch(pngs: list[bytes], desired_channels: int = 4):
    """Decode a batch of fpng PNGs on device.

    Returns (statuses, images): statuses is a list of FPNG_DECODE_* codes;
    images a list of (h, w, desired) uint8 arrays (None on failure).
    All dynamic-block files sharing the batch's (h, w, ch) shape go through
    one device program; odd shapes and stored-block files fall back to the
    scalar path.
    """
    from ..golden import convert_channels, decode_stored

    n = len(pngs)
    statuses = [C.FPNG_DECODE_INVALID_ARG] * n
    images: list = [None] * n
    if desired_channels not in (3, 4):
        return statuses, images

    metas = [_parse_one(p) for p in pngs]
    groups: dict = {}
    for i, m in enumerate(metas):
        status, w, h, ch, src, p0, zlib_len, lut = m
        if status != C.FPNG_DECODE_SUCCESS:
            statuses[i] = status
            continue
        if lut is None:  # stored-block path (host)
            img = decode_stored(src, zlib_len, w, h, ch)
            if img is None:
                statuses[i] = C.FPNG_DECODE_NOT_FPNG
            else:
                statuses[i] = C.FPNG_DECODE_SUCCESS
                images[i] = convert_channels(img, desired_channels)
            continue
        groups.setdefault((h, w, ch), []).append(i)

    for (h, w, ch), idxs in groups.items():
        B = len(idxs)
        max_len = max(len(metas[i][4]) for i in idxs)
        # power-of-two stream buckets: bounds jit recompiles per shape
        nb = 64
        while nb < max_len:
            nb *= 2
        stream = np.zeros((B, nb), np.uint8)
        luts = np.zeros((B, 4096), np.uint32)
        p0 = np.zeros(B, np.int32)
        zl = np.zeros(B, np.int32)
        for j, i in enumerate(idxs):
            _, _, _, _, src, p, zlib_len, lut = metas[i]
            stream[j, :len(src)] = np.frombuffer(src, np.uint8)
            luts[j] = lut
            p0[j] = p
            zl[j] = zlib_len
        imgs, ok = decode_kernel(
            jnp.asarray(stream), jnp.asarray(luts), jnp.asarray(p0),
            jnp.asarray(zl), h=h, w=w, c=ch, n_bits=nb * 8)
        imgs = np.asarray(imgs)
        ok = np.asarray(ok)
        for j, i in enumerate(idxs):
            if ok[j]:
                statuses[i] = C.FPNG_DECODE_SUCCESS
                images[i] = convert_channels(imgs[j], desired_channels)
            else:
                statuses[i] = C.FPNG_DECODE_NOT_FPNG
    return statuses, images
