"""Batched TPU encoder pipeline.

One XLA program encodes a whole batch of same-shape images:

    filter (vector diff) -> RLE match resolution (row scans) -> per-byte
    (code, nbits) units -> bit-offset prefix sum -> two-phase word scatter
    -> device adler32;  histograms ride along for 2-pass mode.

Host work is O(1) per image: Huffman table construction (2-pass),
container framing, CRC splice, and the stored-block fallback decision -
mirroring the reference driver's responsibilities (fpng.cpp:1662-1829)
while everything O(pixels) stays on device.

Bit-exactness: the unit decomposition reproduces the reference token
stream exactly (greedy RLE split, 4ch one-pass cost check, flush-window
fallback rule), so outputs are byte-identical to the golden model / the
reference encoder under the same tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops.checksum import adler32_bytes
from ..ops.filter import filter_deltas
from ..ops.lookup import take_codes_sizes, take_small
from ..ops.tokenize import match_fields
from ..ops.bitpack import deposit_bits, exclusive_offsets

# (1, 256, 2) const planes for the length-symbol tables (one-hot lookup).
# Kept as numpy: a module-level jnp constant gets cached against its first
# jit trace and later leaks that trace's tracer into shard_map regions.
_LEN_TAB = np.stack([np.asarray(C.LEN_SYM, np.int32),
                     np.asarray(C.LEN_EXTRA, np.int32)], axis=1)[None]


def _len_sym_extra(adj, B):
    """LEN_SYM/LEN_EXTRA[adj] without XLA gathers (adj: (B, H, W))."""
    r = take_small(jnp.broadcast_to(_LEN_TAB, (B, 256, 2)),
                   adj.reshape(B, -1), 2)
    return (r[..., 0].reshape(adj.shape), r[..., 1].reshape(adj.shape))


def _masked_hist(oh, masks):
    """Per-image histograms: sum one-hot rows under masks.

    oh: (B, N, 288) bf16 one-hot; masks: list of (B, N) weights.
    Exact: counts < 2^24 accumulate in f32.
    """
    m = jnp.stack([mk.astype(jnp.bfloat16) for mk in masks], axis=1)
    r = jax.lax.dot_general(m, oh, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return r.astype(jnp.int32)  # (B, len(masks), 288)


def _budget(h: int, w: int, c: int) -> int:
    """Reference output-buffer budget for the deflate stream."""
    return ((58 + (w * c + 1) * h + 7) & ~7) - 58


@functools.partial(
    jax.jit,
    static_argnames=("num_chans", "cost_check", "want_hist", "num_words"))
def encode_kernel(imgs, codes, sizes, base_bits, pend_val, pend_n, *,
                  num_chans: int, cost_check: bool, want_hist: bool,
                  num_words: int):
    """Device encode of a (B, H, W, C) uint8 batch.

    codes/sizes: (B, 288) uint32/int32 literal tables;
    base_bits/pend_val/pend_n: (B,) per-image stream start state (the
    serialized header prefix is spliced on host; its sub-byte tail bits are
    emitted as unit 0).
    Returns (words, total_bits, last_token_start, adler, hist).
    """
    B, H, W, Cc = imgs.shape
    assert Cc == num_chans
    deltas = filter_deltas(imgs)
    eq, mstart, mlen_px = match_fields(deltas, num_chans)

    d32 = deltas.astype(jnp.int32)
    flat_d = d32.reshape(B, H * W * Cc)
    lit_c, lit_s = take_codes_sizes(codes, sizes, flat_d)
    lit_sz = lit_s.reshape(B, H, W, Cc)
    lit_cd = lit_c.reshape(B, H, W, Cc)

    mlen_bytes = mlen_px * Cc
    adj = jnp.where(mstart, mlen_bytes - 3, 0)
    len_sym, len_extra = _len_sym_extra(adj, B)  # (B, H, W)
    msym_c, msym_s = take_codes_sizes(codes, sizes, len_sym.reshape(B, -1))
    msym_sz = msym_s.reshape(B, H, W)
    msym_cd = msym_c.reshape(B, H, W)
    extra_val = (adj & ((1 << len_extra) - 1)).astype(jnp.uint32)
    # match emission = len code | extra bits | 1-bit distance code (0)
    match_val = msym_cd | (extra_val << msym_sz.astype(jnp.uint32))
    match_bits = msym_sz + len_extra + 1

    if cost_check:
        # 32bpp 1-pass: single-pixel matches become literals when strictly
        # cheaper (fpng.cpp:1520-1528).
        lit_sum = lit_sz.sum(axis=-1)
        demote = mstart & (mlen_px == 1) & (match_bits > lit_sum)
        mstart = mstart & ~demote
        lit_pixel = ~eq | demote
    else:
        lit_pixel = ~eq

    # --- per-byte units ----------------------------------------------------
    k0 = jnp.zeros((B, H, W, Cc), bool).at[:, :, :, 0].set(True)
    unit_bits = jnp.where(
        lit_pixel[..., None], lit_sz,
        jnp.where((mstart[..., None]) & k0, match_bits[..., None], 0))
    unit_vals = jnp.where(
        lit_pixel[..., None], lit_cd,
        jnp.where((mstart[..., None]) & k0, match_val[..., None],
                  jnp.uint32(0)))

    # filter-byte units: value 0 for row 0, 2 for the rest
    fvals = jnp.where(jnp.arange(H, dtype=jnp.int32) > 0, 2, 0)  # (H,)
    f_idx = jnp.broadcast_to(fvals[None, :], (B, H))
    f_sz = jnp.take_along_axis(sizes, f_idx, axis=1)
    f_cd = jnp.take_along_axis(codes, f_idx, axis=1)

    row_bits = jnp.concatenate(
        [f_sz[:, :, None], unit_bits.reshape(B, H, W * Cc)], axis=2)
    row_vals = jnp.concatenate(
        [f_cd[:, :, None], unit_vals.reshape(B, H, W * Cc)], axis=2)

    eob_sz = sizes[:, 256]
    eob_cd = codes[:, 256]
    nbits = jnp.concatenate(
        [pend_n[:, None], row_bits.reshape(B, -1), eob_sz[:, None]], axis=1)
    vals = jnp.concatenate(
        [pend_val[:, None], row_vals.reshape(B, -1), eob_cd[:, None]], axis=1)

    offsets = exclusive_offsets(nbits, base_bits)
    words = deposit_bits(vals, nbits, offsets, num_words)
    total_bits = offsets[:, -1] + nbits[:, -1]

    # token starts: filter units + first byte of literal pixels + match
    # starts (flush-window fallback rule; EOB/pending excluded)
    tok_px = (lit_pixel | mstart)[..., None] & k0
    tok_mask = jnp.concatenate(
        [jnp.zeros((B, H, 1), bool), tok_px.reshape(B, H, W * Cc)], axis=2)
    tok_mask = jnp.concatenate(
        [jnp.zeros((B, 1), bool), tok_mask.reshape(B, -1),
         jnp.zeros((B, 1), bool)], axis=1)
    last_tok_start = jnp.max(jnp.where(tok_mask, offsets, -1), axis=1)

    # adler32 over the filtered stream (filter bytes included)
    stream_u8 = jnp.concatenate(
        [fvals.astype(jnp.uint8)[None, :, None].repeat(B, axis=0),
         deltas.reshape(B, H, W * Cc)], axis=2).reshape(B, -1)
    adler = adler32_bytes(stream_u8)

    if want_hist:
        oh_d = jax.nn.one_hot(flat_d, C.NUM_LIT_SYMS, dtype=jnp.bfloat16)
        h_lit = _masked_hist(
            oh_d, [jnp.broadcast_to(lit_pixel[..., None],
                                    d32.shape).reshape(B, -1)])[:, 0]
        oh_m = jax.nn.one_hot(len_sym.reshape(B, -1), C.NUM_LIT_SYMS,
                              dtype=jnp.bfloat16)
        h_m = _masked_hist(oh_m, [mstart.reshape(B, -1)])[:, 0]
        hist = h_lit + h_m
        hist = hist.at[:, 0].add(1)                    # row-0 filter byte
        hist = hist.at[:, 2].add(jnp.int32(H - 1))     # Up filter bytes
    else:
        hist = jnp.zeros((B, 1), jnp.int32)

    return words, total_bits, last_tok_start, adler, hist


@functools.partial(jax.jit, static_argnames=("num_chans",))
def hist_kernel(imgs, *, num_chans: int):
    """Pass 1 of 2-pass mode: histogram + nothing else."""
    B, H, W, Cc = imgs.shape
    deltas = filter_deltas(imgs)
    eq, mstart, mlen_px = match_fields(deltas, num_chans)
    d32 = deltas.astype(jnp.int32)
    adj = jnp.where(mstart, mlen_px * Cc - 3, 0)
    len_sym, _ = _len_sym_extra(adj, B)
    oh_d = jax.nn.one_hot(d32.reshape(B, -1), C.NUM_LIT_SYMS,
                          dtype=jnp.bfloat16)
    h_lit = _masked_hist(
        oh_d, [jnp.broadcast_to((~eq)[..., None],
                                d32.shape).reshape(B, -1)])[:, 0]
    oh_m = jax.nn.one_hot(len_sym.reshape(B, -1), C.NUM_LIT_SYMS,
                          dtype=jnp.bfloat16)
    h_m = _masked_hist(oh_m, [mstart.reshape(B, -1)])[:, 0]
    hist = h_lit + h_m
    hist = hist.at[:, 0].add(1)
    hist = hist.at[:, 2].add(jnp.int32(H - 1))
    return hist


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


def _stored_png(img: np.ndarray) -> bytes:
    from ..container import build_png
    from ..golden import write_stored_stream

    h, w, c = img.shape
    filtered0 = np.zeros((h, 1 + w * c), np.uint8)
    filtered0[:, 1:] = img.reshape(h, w * c)
    z = write_stored_stream(filtered0)
    return build_png(z, w, h, c)


def _assemble(img, words_row, total_bits, last_tok, adler, budget,
              prefix: bytes) -> bytes:
    from ..container import build_png

    h, w, c = img.shape
    total_bytes = (int(total_bits) + 7) >> 3
    fail = (int(last_tok) >= 0 and (int(last_tok) >> 3) + 8 > budget) or \
        (total_bytes + 4 > budget) or (len(prefix) > budget)
    if fail:
        return _stored_png(img)
    buf = bytearray(np.asarray(words_row).tobytes()[:total_bytes])
    buf[:len(prefix)] = prefix
    z = bytes(buf) + int(adler).to_bytes(4, "big")
    return build_png(z, w, h, c)


def _validate(images: np.ndarray):
    if images.ndim != 4:
        raise ValueError("encode_batch expects (B, H, W, C) uint8")
    B, H, W, Cc = images.shape
    if Cc not in (3, 4):
        raise ValueError("channels must be 3 or 4")
    if H < 1 or W < 1 or W * H > 0xFFFFFFFF or \
            W > C.MAX_SUPPORTED_DIM or H > C.MAX_SUPPORTED_DIM:
        raise ValueError("unsupported dimensions")


def encode_batch(images, flags: int = 0) -> list[bytes]:
    """Encode a (B, H, W, C) uint8 batch into PNG byte strings."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    return encode_batch_device_input(None, images, flags)


def encode_batch_device_input(dev_imgs, images: np.ndarray,
                              flags: int = 0) -> list[bytes]:
    """encode_batch over a pre-placed (possibly mesh-sharded) device array.

    `images` is the matching host copy used for container assembly and the
    stored-block fallback.
    """
    _validate(images)
    B, H, W, Cc = images.shape

    if flags & C.FPNG_FORCE_UNCOMPRESSED:
        return [_stored_png(images[b]) for b in range(B)]

    budget = _budget(H, W, Cc)
    num_words = max(budget // 4 + 4, 8)
    if dev_imgs is None:
        dev_imgs = jnp.asarray(images)

    if flags & C.FPNG_ENCODE_SLOWER:
        from ..bitio import BitWriter
        from ..huffman import build_tables, emit_dynamic_block_header

        hist = np.asarray(hist_kernel(dev_imgs, num_chans=Cc)).astype(np.uint32)
        codes = np.zeros((B, C.NUM_LIT_SYMS), np.uint32)
        sizes = np.zeros((B, C.NUM_LIT_SYMS), np.int32)
        prefixes: list[bytes] = []
        base_bits = np.zeros(B, np.int32)
        pend_val = np.zeros(B, np.uint32)
        pend_n = np.zeros(B, np.int32)
        for b in range(B):
            freq = hist[b].copy()
            freq[256] = 1
            t = build_tables(freq, Cc)
            codes[b] = t.lit_codes
            sizes[b] = t.lit_sizes
            wtr = BitWriter()
            wtr.put_and_drain(C.ZLIB_HDR0, 8)
            wtr.put_and_drain(C.ZLIB_HDR1, 8)
            wtr.put_and_drain(1, 1)
            emit_dynamic_block_header(wtr, t)
            acc, nacc = wtr.pending
            wtr._acc = wtr._nacc = 0
            p = wtr.getvalue()
            prefixes.append(p)
            base_bits[b] = len(p) * 8
            pend_val[b] = acc
            pend_n[b] = nacc
        cost_check = False
    else:
        from ..tables import get_one_pass_tables

        prefix, acc, nacc, codes1, sizes1 = get_one_pass_tables(Cc)
        codes = np.broadcast_to(codes1.astype(np.uint32),
                                (B, C.NUM_LIT_SYMS)).copy()
        sizes = np.broadcast_to(sizes1.astype(np.int32),
                                (B, C.NUM_LIT_SYMS)).copy()
        prefixes = [prefix] * B
        base_bits = np.full(B, len(prefix) * 8, np.int32)
        pend_val = np.full(B, acc, np.uint32)
        pend_n = np.full(B, nacc, np.int32)
        cost_check = (Cc == 4)

    words, total_bits, last_tok, adler, _ = encode_kernel(
        dev_imgs, jnp.asarray(codes), jnp.asarray(sizes),
        jnp.asarray(base_bits), jnp.asarray(pend_val), jnp.asarray(pend_n),
        num_chans=Cc, cost_check=cost_check, want_hist=False,
        num_words=num_words)

    words = np.asarray(words)
    total_bits = np.asarray(total_bits)
    last_tok = np.asarray(last_tok)
    adler = np.asarray(adler)

    from .. import runtime
    if runtime.available():
        pngs = runtime.assemble_batch(words, total_bits, last_tok, adler,
                                      prefixes, W, H, Cc, budget)
        return [p if p is not None else _stored_png(images[b])
                for b, p in enumerate(pngs)]
    return [
        _assemble(images[b], words[b], total_bits[b], last_tok[b], adler[b],
                  budget, prefixes[b])
        for b in range(B)
    ]
