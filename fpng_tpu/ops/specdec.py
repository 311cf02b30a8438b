"""Chunked speculative Huffman decode (the fast device decode path).

The reference decodes the single deflate block with a sequential 12-bit
table loop (fpng.cpp:2209-2901).  The TPU reformulation splits the
bitstream into S-bit chunks and walks tokens from every chunk boundary in
lockstep (lanes = batch x chunks), then iterates the chunk entry points to
a fixpoint:

  pass k:   exit[c] = walk(entry[c]) for all chunks in parallel
            entry[c+1] <- exit[c]          (entry[0] = p0 is exact)

Huffman streams self-synchronize, so entries converge in 2-3 passes for
real data; the fixpoint is *guaranteed* exact (entry[c] is correct after at
most c passes, and an unchanged pass proves every entry equals the exit of
its predecessor's true walk).  A final recording pass re-walks the chunks
with exact per-chunk output offsets (exclusive scan of per-chunk output
byte counts), scatters literal bytes by output offset, and checks every
structural constraint the reference enforces (filter-byte placement, match
alignment/caps, EOB position, stream end) so that any violation downgrades
to FPNG_DECODE_NOT_FPNG.

Compared to a pointer-doubling formulation this does O(total_tokens) work
in ~3 passes of small lockstep steps instead of O(n_bits * log n_bits)
full-stream gather compositions.

LUT entries here are "packed": sym | clen<<9 | nextra<<13 | run_base<<16
(see pack_lut) so one lookup yields the full token geometry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

CHUNK_BITS = 2048  # S: lockstep-walk chunk size in bits (large streams)


def plan_chunks(nb: int):
    """(chunk_bits, n_chunks, max_steps) for an nb-byte stream bucket.

    Small buckets get small chunks so the recording walk's static step
    bound covers every possible token count (no overflow fallback);
    large buckets use CHUNK_BITS with a 768-step cap - streams averaging
    under ~2.7 bits/token overflow to the host decoder.
    """
    bits = nb * 8
    s = 128
    while s < CHUNK_BITS and s * 256 < bits:
        s *= 2
    nc = max(1, -(-bits // s))
    st = s + 24 if s <= 744 else 768
    return s, nc, st


def pack_lut(lut: np.ndarray) -> np.ndarray:
    """Pack run geometry into a 12-bit decode LUT (host side, numpy).

    Input entries: sym | clen<<9 (huffman.build_decoder_table).  Output
    adds, for length symbols, nextra<<13 and run_base<<16; for literal
    symbols, a speculatively packed SECOND literal (s2<<16 | len2<<25)
    when the entry's remaining window bits fully contain another literal
    code - the reference decoder's own second-symbol trick
    (fpng.cpp:2080-2102), which lets the walk consume two tokens per
    lookup.  One lookup yields the full geometry either way.
    """
    sym = lut & 511
    clen = (lut >> 9) & 15
    out = lut.astype(np.uint32) & 0x1FFF
    is_len = (sym > 256) & (sym <= 285) & (lut != 0)
    idx = np.clip(sym - 257, 0, 28)
    nextra = np.where(is_len, C.LEN_EXTRA_BY_SYM[idx], 0).astype(np.uint32)
    base = np.where(is_len, C.LEN_BASE_BY_SYM[idx], 0).astype(np.uint32)
    out = out | (nextra << 13) | (base << 16)

    # second-symbol packing: canonical LUT entries for a code of length L
    # repeat across all indices sharing the low L bits, so indexing with
    # the zero-extended remainder is exact whenever len2 <= 12 - clen
    i12 = np.arange(lut.shape[0], dtype=np.uint32)
    rem = (i12 >> clen) & 0xFFF
    e2 = lut[rem]
    s2 = (e2 & 511).astype(np.uint32)
    l2 = ((e2 >> 9) & 15).astype(np.uint32)
    lit1 = (sym < 256) & (clen > 0)
    ok2 = lit1 & (l2 > 0) & (s2 < 256) & (l2 + clen <= 12)
    out = out | np.where(ok2, (s2 << 16) | (l2 << 25), 0).astype(np.uint32)
    # syms 286/287 are not legal deflate length codes; they keep their
    # clen (walks must keep advancing - a frozen position would poison
    # the entry fixpoint) but carry no geometry, and the record pass
    # rejects them on the true chain
    return out


def _window24(stream: jnp.ndarray) -> jnp.ndarray:
    """(B, Nb) uint8 -> (B, Nb) int32 of 24-bit LE windows at each byte."""
    s32 = stream.astype(jnp.int32)
    z = jnp.zeros((stream.shape[0], 2), jnp.int32)
    sp = jnp.concatenate([s32, z], axis=1)
    return sp[:, :-2] | (sp[:, 1:-1] << 8) | (sp[:, 2:] << 16)


def _step(w24, lutp, pos):
    """Decode the token at bit positions pos: full geometry, no record.

    Returns (sym, clen, tok_bits, outlen, run, stop).

    Every valid window ADVANCES - EOB steps by its code length with zero
    output and reserved syms 286/287 likewise.  A mid-stream freeze would
    let spurious walks pin a position that then travels through the entry
    fixpoint one chunk per pass (poisoning convergence); only clen == 0
    (incomplete/degenerate tables) stops a lane.
    """
    byte = pos >> 3
    w = jnp.take_along_axis(w24, byte, axis=1)
    sh = pos & 7
    bits12 = (w >> sh) & 0xFFF
    e = jnp.take_along_axis(lutp, bits12, axis=1).astype(jnp.int32)
    sym = e & 511
    clen = (e >> 9) & 15
    nextra = (e >> 13) & 7
    base = (e >> 16) & 0x1FF
    is_match = (sym > 256) & (sym <= 285)
    extra = (w >> (sh + clen)) & ((1 << nextra) - 1)
    run = base + extra
    # match token = length code + extra bits + the 1-bit distance code
    tok = clen + jnp.where(is_match, nextra + 1, 0)
    outlen = jnp.where(sym < 256, 1, jnp.where(is_match, run, 0))
    stop = clen == 0
    return sym, clen, tok, outlen, run, stop


def _walk(w24, lutp, entries, ends, dead, max_steps):
    """Lockstep chunk walk: (exit_pos, out_bytes) per lane.

    `dead` lanes (chunk start past the true stream end) are pinned to a
    constant exit so the entry fixpoint converges in O(sync) passes: the
    zero padding past a stream decodes as a *periodic* token pattern that
    never self-synchronizes, which would otherwise force one pass per
    padding chunk.
    """

    def cond(st):
        i, _pos, _out, act = st
        return (i < max_steps) & jnp.any(act)

    def body(st):
        i, pos, out, act = st
        _sym, _clen, tok, outlen, _run, stop = _step(w24, lutp, pos)
        adv = act & ~stop
        pos = jnp.where(adv, pos + tok, pos)
        out = out + jnp.where(adv, outlen, 0)
        act = adv & (pos < ends)
        return i + 1, pos, out, act

    act0 = (entries < ends) & ~dead
    _, pos, out, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), entries, jnp.zeros_like(entries), act0))
    return jnp.where(dead, 0, pos), jnp.where(dead, 0, out)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "c", "n_chunks", "chunk_bits", "max_steps"))
def decode_kernel(stream, lutp, p0, zlib_len, *, h: int, w: int, c: int,
                  n_chunks: int, chunk_bits: int = CHUNK_BITS,
                  max_steps: int = 768):
    """Device decode of B same-shape fpng dynamic-block streams.

    stream: (B, Nb) uint8 zlib payloads (from the zlib header), zero
    padded; lutp: (B, 4096) uint32 packed LUTs; p0: (B,) first token bit
    position; zlib_len: (B,) IDAT byte lengths.  chunk_bits/n_chunks/
    max_steps come from plan_chunks(Nb).
    Returns (imgs (B,h,w,c) uint8, ok (B,) bool, overflow (B,) bool).
    """
    B = stream.shape[0]
    S = chunk_bits
    NC = n_chunks
    bpl = w * c
    row_stride = 1 + bpl
    total = h * row_stride

    w24 = _window24(stream)
    starts = (jnp.arange(NC, dtype=jnp.int32) * S)[None, :]
    # lanes whose chunk lies entirely past the true stream end never hold
    # real-chain positions; pin them so the fixpoint ignores the padding.
    # Clamping every lane's end to the true stream end also keeps walks
    # out of the zero tail (whose short periodic tokens would otherwise
    # set each pass's lockstep step count)
    zl8 = zlib_len[:, None] * 8
    dead = starts >= zl8
    bounds = jnp.minimum(jnp.broadcast_to(starts + S, (B, NC)), zl8)

    # --- entry fixpoint iteration -----------------------------------------
    e0 = jnp.broadcast_to(starts, (B, NC)).at[:, 0].set(p0)

    def fix_cond(st):
        k, _e, _x, _o, changed = st
        return changed & (k <= NC)

    def fix_body(st):
        k, e, _x, _o, _changed = st
        x, o = _walk(w24, lutp, e, bounds, dead, S + 24)
        new_e = jnp.concatenate([p0[:, None], x[:, :-1]], axis=1)
        return k + 1, new_e, x, o, jnp.any(new_e != e)

    z = jnp.zeros((B, NC), jnp.int32)
    _, entries, _exits, outb, _ = jax.lax.while_loop(
        fix_cond, fix_body,
        (jnp.int32(0), e0, z, z, jnp.bool_(True)))

    out0 = jnp.cumsum(outb, axis=1) - outb  # entry output offsets

    # --- recording walk ------------------------------------------------------
    # No scatters in the loop: each step appends one dense record column
    # (clamped output offset + sym/lit flag).  Records are then expanded
    # into (sym, literal-flag) byte pairs by the monotonic Pallas deposit
    # (ops/bitpack.py) - TPU has no fast scatter, but the record stream is
    # sorted by output offset by construction.
    ST = max_steps
    # unused trailing record slots must keep the flattened record stream
    # monotone for the Pallas deposit: initialize each lane's records to
    # its final output offset (entry + walked output bytes)
    lane_end = jnp.minimum(out0 + outb, total)
    # layout (B, ST, NC): each step writes one contiguous row
    rec_out0 = jnp.broadcast_to(lane_end[:, None, :], (B, ST, NC))
    rec_sym0 = jnp.zeros((B, ST, NC), jnp.int32)

    def rec_cond(st):
        i = st[0]
        return (i < ST) & jnp.any(st[3])

    def rec_body(st):
        (i, pos, outp, act, rec_out, rec_sym, fail, eob_seen, eob_end,
         bad_end) = st
        sym, clen, tok, outlen, run, stop = _step(w24, lutp, pos)
        is_match = (sym > 256) & (sym <= 285)
        rowpos = outp % row_stride
        x = rowpos - 1

        # `live` tokens are on the true chain before the EOB slot; tokens
        # past it are post-stream garbage the reference never reads
        live = act & (outp < total)
        fail = fail | (live & ((clen == 0) | (sym > 285)))
        at_filter = live & (rowpos == 0)
        fexp = jnp.where(outp >= row_stride, 2, 0)
        fail = fail | (at_filter & ((sym >= 256) | (sym != fexp)))
        mt = live & is_match
        mok = (rowpos >= 1) & (x % c == 0) & (run % c == 0) & (x + run <= bpl)
        fail = fail | (mt & ~mok)
        misal = live & (rowpos >= 1) & (x % c != 0)
        fail = fail | (misal & (sym >= 256))
        # a live EOB (outp < total) truncates the image
        fail = fail | (live & (sym == 256))
        # the true EOB is the FIRST token at outp == total (min-reduce:
        # post-EOB garbage can also decode as EOB without advancing outp);
        # a non-EOB token reaching the total slot first must reject
        at_total = act & (outp == total)
        at_eob = at_total & (sym == 256)
        eob_seen = eob_seen | at_eob
        eob_end = jnp.minimum(eob_end,
                              jnp.where(at_eob, pos + clen, 0x7FFFFFFF))
        bad_end = jnp.minimum(bad_end,
                              jnp.where(at_total & (sym != 256), pos,
                                        0x7FFFFFFF))

        lit = live & (sym < 256) & (clen > 0)
        rec_out = rec_out.at[:, i, :].set(jnp.minimum(outp, total))
        rec_sym = rec_sym.at[:, i, :].set(
            jnp.where(lit, sym | 0x100, 0))

        adv = act & ~stop
        pos = jnp.where(adv, pos + tok, pos)
        outp = outp + jnp.where(adv, outlen, 0)
        act = adv & (pos < bounds)
        return (i + 1, pos, outp, act, rec_out, rec_sym, fail, eob_seen,
                eob_end, bad_end)

    act0 = (entries < bounds) & ~dead
    st = (jnp.int32(0), entries, out0, act0, rec_out0, rec_sym0,
          jnp.zeros((B, NC), jnp.bool_), jnp.zeros((B, NC), jnp.bool_),
          jnp.full((B, NC), 0x7FFFFFFF, jnp.int32),
          jnp.full((B, NC), 0x7FFFFFFF, jnp.int32))
    st = jax.lax.while_loop(rec_cond, rec_body, st)
    (_, _, _, act_end, rec_out, rec_sym, fail, eob_seen, eob_end,
     bad_end) = st
    # lanes still active at the step cap: token count exceeded the static
    # bound (sub-2.7-bit average codes); the caller decodes on host
    overflow = jnp.any(act_end, axis=1)

    ok = ~jnp.any(fail, axis=1)
    ok &= jnp.any(eob_seen, axis=1)
    end_bits = jnp.min(eob_end, axis=1)
    # the EOB must be the chain's first arrival at the total slot
    ok &= end_bits <= jnp.min(bad_end, axis=1)
    ok &= ((end_bits + 7) >> 3) == (zlib_len - 4)

    # --- record expansion (monotonic 16-bit deposits: sym | lit<<8) ---------
    from .bitpack import deposit_bits

    n_rec = NC * ST
    dep_words = -(-(16 * (total + 1)) // 32) + 1
    # transpose to lane-major so the flattened record stream is sorted
    rs = jnp.swapaxes(rec_sym, 1, 2).reshape(B, n_rec)
    ro = jnp.swapaxes(rec_out, 1, 2).reshape(B, n_rec)
    dep = deposit_bits(
        rs.astype(jnp.uint32), jnp.where(rs != 0, 16, 0), ro * 16,
        dep_words, zero_init=True)
    pairs = jax.lax.bitcast_convert_type(dep, jnp.uint8) \
        .reshape(B, dep_words * 4)[:, :2 * total].reshape(B, total, 2)
    syms = pairs[..., 0]
    plit_b = pairs[..., 1] > 0

    # --- byte expansion (fused defilter: matches replicate the previous
    # pixel's deltas -> per-row forward fill from the last literal pixel +
    # a column cumsum; fpng.cpp:2290-2549) ----------------------------------
    syms_px = syms.reshape(B, h, row_stride)[:, :, 1:].reshape(B, h, w, c)
    plit = plit_b.reshape(B, h, row_stride)[:, :, 1:] \
        .reshape(B, h, w, c)[..., 0]

    payload = jnp.zeros((B, h, w), jnp.int32)
    for k in range(c):
        payload = payload | (syms_px[..., k].astype(jnp.int32) << (8 * k))

    def fill_combine(a, b):
        (pa, fa), (pb, fb) = a, b
        return jnp.where(fb, pb, pa), fa | fb

    filled, _ = jax.lax.associative_scan(
        fill_combine, (payload, plit), axis=2)
    deltas = jnp.stack(
        [(filled >> (8 * k)) & 0xFF for k in range(c)],
        axis=-1).astype(jnp.int32)

    imgs = jnp.cumsum(deltas, axis=1).astype(jnp.uint8)
    return imgs, ok & ~overflow, overflow
