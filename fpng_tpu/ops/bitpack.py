"""Parallel variable-length bitstream packing.

The reference's sequential 64-bit accumulator (PUT_BITS*, fpng.cpp:564-588)
becomes: per-unit (value, nbits) pairs -> exclusive prefix-sum of nbits ->
each unit's bits split into (word, word+1) 32-bit contributions -> a
deposit into output words.

Two deposit implementations:

* scatter_bits: two XLA scatter-adds.  Correct everywhere, but XLA TPU
  scatters run at ~100 Melem/s - the encoder's bottleneck.
* scatter_bits_tpu: a Pallas kernel.  The TPU has no fast general
  scatter, but unit offsets are MONOTONIC, so each 256-unit tile touches
  a <=272-word window.  Each grid step deposits its tile into a 3-row
  (384-word) 128-aligned window with two one-hot fp32 MXU matmuls (bit
  ranges never overlap, so per-word sums of 16-bit halves stay exact
  under fp32), adds the carried overlap rows from the previous tile, and
  stores the window at a dynamic sublane offset.  The sequential TPU grid
  makes the row carry race-free.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# ---------------------------------------------------------------------------
# Pallas TPU deposit
# ---------------------------------------------------------------------------

_U = 1024         # units per sub-tile (shaped (8, 128) for VMEM tiling)
_SUB = 16         # sub-tiles per grid step (amortizes pipeline overhead)
_WL = 1024        # window words (8 sublane rows); >= 127 + 576 + 2 spill
_WROWS = _WL // 128


def _window_deposit(vals, offs, idxv, wl_words, out_ref, pending, prevr,
                    base0=None, vals_hi=None, skip_empty=False,
                    pair16=False, nb_lo=4, nb_hi=None, i8=False,
                    hbm=None):
    """Deposit one flat (_U,) sub-tile of (uint32 value, bit offset) units
    into out_ref through the carried window (pending/prevr scratch).

    vals_hi turns each unit into a 64-bit value (vals = low word, vals_hi
    = high word at offs+32): contributions span three output words, so
    the scatter runs 12 byte planes and a 3-way positional combine
    (word, word+1, word+2) instead of 8 planes / 2-way.

    pair16 asserts every offset is 16-bit aligned (the decoder's slot
    records): the spill word then only ever receives the value's high
    16 bits, so its top two byte planes are identically zero and the
    scatter runs 6 planes instead of 8 - fewer matmul M rows, which is
    what bounds how large a window (and so how few scalar-taxed window
    walks) a group can use.

    i8 runs the scatter matmuls in int8 (s8 x s8 -> s32, ~2x the MXU's
    bf16 rate and half the masked-plane build bytes).  Byte planes hold
    0..255, outside s8's range, so planes carry (byte - 128) and one
    extra count plane per window row restores the offset after the dot:
    out = dot + 128 * cnt is exact because the correction is linear and
    every unit's count contribution rides the same mask/one-hot as its
    value planes (dead/fill units - value 0, possibly sharing a clamped
    slot - contribute (0-128)+128 = 0 net, and no live slot is ever
    written by more than one unit).

    wl_words sets the window geometry (word width / row count) so callers
    can trade scatter width against window-walk iterations; the pending
    scratch must hold 2x the matching row count.

    Units are sorted by offset but may have arbitrary gaps (the decoder's
    record expansion skips match-covered bytes), so one sub-tile can span
    several deposit windows.  Walk windows with a scalar first-unprocessed
    index; each window covers a contiguous sorted range, so the index
    advances by the in-window count.

    base0 (scalar word row of the sub-tile's FIRST unit, when the caller
    can supply it cheaply) moves the common whole-tile-fits-one-window
    case out of the while loop into straight-line code: Mosaic while
    iterations cost ~1us each in scalar sync, which dominated the deposit
    at one loop entry per tile.

    hbm = (win_buf, sem, b): the output words live in HBM (images whose
    word buffer exceeds the VMEM budget - e.g. a 4K raster's 50MB slot
    buffer); each window is staged through the win_buf VMEM scratch and
    DMA'd to out_ref[b, base_row:base_row+wrows).  The copy is waited
    synchronously: consecutive windows overlap by the carry rows, so
    write order matters, and the ~1us DMA wait per wl-word window is
    small against the window's own matmul work.
    """
    wrows = wl_words // 128
    word = offs >> 5
    sh = (offs & 31).astype(jnp.uint32)
    lo = vals << sh
    hi = (vals >> jnp.uint32(1)) >> (jnp.uint32(31) - sh)
    if vals_hi is not None:
        hi = hi | (vals_hi << sh)
        top = (vals_hi >> jnp.uint32(1)) >> (jnp.uint32(31) - sh)
    else:
        top = None
    cols128 = jax.lax.broadcasted_iota(jnp.int32, (offs.shape[0], 128), 1)

    nz = lo | hi if top is None else lo | hi | top
    n_eff = jnp.max(jnp.where(nz != 0, idxv, -1)) + 1

    def one_window(i0, base_row):
        wl = word - base_row * 128
        in_win = (idxv >= i0) & \
            (wl < wl_words - (1 if top is None else 2))
        # fold the window mask into wl (Mosaic cannot broadcast an
        # i1 minor dim): out-of-window units match no column
        wl_m = jnp.where(in_win, wl, -1)
        mlo = jnp.where(in_win, lo, 0)
        mhi = jnp.where(in_win, hi, 0)

        # i8 mode builds/masks planes in int32 (Mosaic has no elementwise
        # s8 arithmetic) and converts to s8 only at the matmul operand
        mmt = jnp.int32 if i8 else jnp.bfloat16

        def byte_planes(v, nb=4):
            p = [((v >> (8 * j)) & 0xFF).astype(jnp.int32)
                 for j in range(nb)]
            if i8:  # s8 range shift; the count plane restores it
                p = [x - 128 for x in p]
            return jnp.stack(p).astype(mmt)
        # plane groups: (byte rows, word shift) per contributing word;
        # callers whose values/alignments bound which bytes can be
        # nonzero trim the plane count (fewer matmul M rows)
        nbh = nb_hi if nb_hi is not None else (2 if pair16 else 4)
        groups = [(byte_planes(mlo, nb_lo), nb_lo, 0),
                  (byte_planes(mhi, nbh), nbh, 1)]
        if top is not None:
            groups.append((byte_planes(jnp.where(in_win, top, 0)), 4, 2))
        planes = jnp.concatenate([g[0] for g in groups])
        if i8:
            # count plane: 1 per unit, same row mask / one-hot as the
            # value planes; corrects the -128 shift after the dot
            planes = jnp.concatenate(
                [planes, jnp.full(planes.shape[1:], 1, mmt)[None]])

        # Row-factored one-hot: building a full (group, wl) one-hot costs
        # ~2*g*wl vector ops - more than the matmul's MXU time.  The
        # window column factors as wl = 128*r + c, so one (group, 128)
        # column one-hot (shared by all rows) plus a per-row scalar mask
        # folded into the planes does the same scatter with ~wl/9 of the
        # construction work.  MXU pass count is unchanged (M<=128 is one
        # tile either way).
        # fold the window mask into the column index (Mosaic cannot
        # broadcast an i1 minor dim): masked units match no column
        c_u = jnp.where(wl_m >= 0, wl_m & 127, -1)
        r_u = wl_m >> 7
        if i8:
            ohc = jnp.where(cols128 == c_u[:, None], 1, 0).astype(jnp.int8)
        else:
            ohc = (cols128 == c_u[:, None]).astype(jnp.bfloat16)
        P = planes.shape[0]
        G = planes.shape[1]
        # pad the plane stack to a sublane-aligned count: the matmul
        # result then reshapes (wrows*Pp, 128) <-> (wrows, Pp, 128) for
        # free, which lets every post-dot step run ONCE over all window
        # rows.  (The former per-row combine loop issued ~10 ops per
        # (4, 128) row tile; its dispatch latency - walks x wrows ~ N/256
        # regardless of geometry - was the deposit's measured pole, the
        # "geometry-insensitive" cost in STATUS r3/r4.)
        Pp = -(-P // 8) * 8
        if Pp > P:
            planes = jnp.concatenate(
                [planes, jnp.zeros((Pp - P, G), mmt)], axis=0)
        abl = _os.environ.get("FPNG_TPU_DEP_ABL", "")  # profiling only
        if abl == "nobuild":  # skip the row masking (wrong results)
            big = jnp.broadcast_to(planes[None], (wrows, Pp, G))
        else:
            rowm = (r_u[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (wrows, G), 0)).astype(mmt)
            big = planes[None, :, :] * rowm[:, None, :]
        big = big.reshape(wrows * Pp, G)
        if abl == "nomxu":  # skip the dot (wrong results)
            a3 = big[:, :128].astype(jnp.int32).reshape(wrows, Pp, 128)
        elif i8:
            a3 = jnp.dot(big.astype(jnp.int8), ohc,
                         preferred_element_type=jnp.int32) \
                .reshape(wrows, Pp, 128)
        else:
            a3 = jnp.dot(big, ohc, preferred_element_type=jnp.float32) \
                .astype(jnp.int32).reshape(wrows, Pp, 128)
        if i8:
            # count plane (last live row) restores the -128 shift of
            # every computed byte plane; uncomputed (pad) byte planes
            # are exact zeros and need no correction
            a3 = a3[:, :P - 1] + (a3[:, P - 1:P] << 7)

        lane3 = jax.lax.broadcasted_iota(jnp.int32, (wrows, 4, 128), 2)
        ws = None
        base = 0
        for _arr, nb, shw in groups:
            cur = a3[:, base:base + nb]
            if nb < 4:
                cur = jnp.concatenate(
                    [cur, jnp.zeros((wrows, 4 - nb, 128), jnp.int32)],
                    axis=1)
            if shw == 0:
                contrib = cur
            else:
                # bytes land shw words later; the first shw words of a
                # row take the previous row's tail carry
                prev = jnp.concatenate(
                    [jnp.zeros((1, 4, 128), jnp.int32), cur[:-1]], axis=0)
                rc = pltpu.roll(cur.reshape(wrows * 4, 128), shw, 1) \
                    .reshape(wrows, 4, 128)
                rp = pltpu.roll(prev.reshape(wrows * 4, 128), shw, 1) \
                    .reshape(wrows, 4, 128)
                contrib = jnp.where(lane3 > shw - 1, rc, rp)
            ws = contrib if ws is None else ws + contrib
            base += nb
        win = (ws[:, 0] | (ws[:, 1] << 8) | (ws[:, 2] << 16) |
               (ws[:, 3] << 24)).astype(jnp.uint32)

        # d > wrows (gap): the clamped read lands in the zeroed
        # upper half of `pending`
        d = jnp.clip(base_row - prevr[0], 0, wrows)
        shifted = pending[pl.ds(d, wrows), :]
        combined = win + shifted

        if hbm is None:
            out_ref[0, pl.ds(base_row, wrows), :] = combined
        else:
            win_buf, sem, b = hbm
            win_buf[...] = combined
            cp = pltpu.make_async_copy(
                win_buf, out_ref.at[b, pl.ds(base_row, wrows), :], sem)
            cp.start()
            cp.wait()
        pending[0:wrows, :] = combined
        prevr[0] = base_row
        return i0 + jnp.sum(in_win.astype(jnp.int32))

    def win_body(i0):
        base_row = jnp.min(
            jnp.where(idxv >= i0, word, 0x7FFFFFFF)) // 128
        return one_window(i0, base_row)

    def run_all():
        i0 = jnp.int32(0)
        if base0 is not None:
            # straight-line first window at the caller-supplied base row;
            # clamp to the carry so a malformed (non-monotone) offset
            # stream degrades to extra loop windows instead of rewinding
            # the carry
            i0 = one_window(i0, jnp.maximum(base0, prevr[0]))
        jax.lax.while_loop(lambda i: i < n_eff, win_body, i0)

    if skip_empty:
        # all-zero sub-tiles (e.g. the decoder's fill records past dead
        # lanes) deposit nothing - skip even the straight-line window
        pl.when(n_eff > 0)(run_all)
    else:
        run_all()


def _flat_idx():
    idxv = jax.lax.broadcasted_iota(jnp.int32, (8, _U // 8), 0) * (_U // 8) \
        + jax.lax.broadcasted_iota(jnp.int32, (8, _U // 8), 1)
    return idxv.reshape(_U)


def _make_deposit_kernel(group: int, wl: int, zero_init: bool,
                         packed16: bool = False, sub: int = _SUB,
                         i8: bool = False, wide: bool = False,
                         hbm: bool = False):
    """Deposit kernel over `group`-unit window walks with wl-word windows.

    Bigger groups amortize the per-walk fixed cost (scalar window scan,
    dynamic stores) at the price of a wider scatter; the decoder's
    expansion (fixed 16-bit units) uses group=2048/wl=1152 while the
    encoder fallback keeps 1024/1024.

    packed16: single int32 input per unit - (value9 << 23) | slot23 -
    decoded in-kernel (value at bit slot*16); spares the caller three
    O(N) staged value/nbits/offset arrays in HBM.

    wide: two-plane record format for rasters past the 23-bit slot field
    (requires packed16 == "pair"): plane A is the bare slot index (up to
    2^27), plane B carries both values pre-shifted -
    (0x100|v1) | ((0x100|s2) << 16), 0 = gap row.  Same HBM traffic as
    pair mode (two int32 planes either way).

    hbm: the output block exceeds the VMEM budget; out_ref lives in HBM
    (memory_space ANY, zero-filled via input/output aliasing) and every
    window is staged through a VMEM scratch + synchronous DMA.
    """
    grows = group // 128
    if wide:
        assert packed16 == "pair", "wide records require the pair planes"

    def kernel(vals_ref, *rest):
        if packed16 == "pair":
            metb_ref, rest = rest[0], rest[1:]
        else:
            metb_ref = None
            if not packed16:
                offs_ref, rest = rest[0], rest[1:]
        if hbm:
            (_zeros_ref, out_ref, pending, prevr, win_buf, sem) = rest
            hbm_t = (win_buf, sem, pl.program_id(0))
        else:
            (out_ref, pending, prevr) = rest
            hbm_t = None
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            pending[...] = jnp.zeros_like(pending)
            if wide:
                prevr[0] = (vals_ref[0, 0, 0, 0] >> 1) // 128
            elif packed16:
                prevr[0] = ((vals_ref[0, 0, 0, 0] & 0x7FFFFF) >> 1) // 128
            else:
                prevr[0] = (offs_ref[0, 0, 0, 0] >> 5) // 128
            if zero_init and not hbm:
                # clear the image's word block on its first grid step so
                # gap words (byte ranges no unit touches) read as zero
                # (HBM mode starts from an aliased zero-filled buffer)
                out_ref[...] = jnp.zeros_like(out_ref)

        idxv = (jax.lax.broadcasted_iota(jnp.int32, (grows, 128), 0) * 128 +
                jax.lax.broadcasted_iota(jnp.int32, (grows, 128), 1)) \
            .reshape(group)
        for k in range((_U * sub) // group):
            if wide:
                m = vals_ref[0, 0, grows * k:grows * (k + 1), :] \
                    .reshape(group)
                mb = metb_ref[0, 0, grows * k:grows * (k + 1), :] \
                    .reshape(group)
                vals = mb.astype(jnp.uint32)
                offs = m << 4
                base0 = (vals_ref[0, 0, grows * k, 0] >> 1) // 128
            elif packed16:
                m = vals_ref[0, 0, grows * k:grows * (k + 1), :] \
                    .reshape(group)
                vals = ((m >> 23) & 0x1FF).astype(jnp.uint32)
                if metb_ref is not None:
                    mb = metb_ref[0, 0, grows * k:grows * (k + 1), :] \
                        .reshape(group)
                    vals = vals | ((mb & 0x1FF).astype(jnp.uint32) << 16)
                offs = (m & 0x7FFFFF) << 4
                base0 = ((vals_ref[0, 0, grows * k, 0] & 0x7FFFFF) >> 1) \
                    // 128
            else:
                vals = vals_ref[0, 0, grows * k:grows * (k + 1), :] \
                    .reshape(group).astype(jnp.uint32)
                offs = offs_ref[0, 0, grows * k:grows * (k + 1), :] \
                    .reshape(group)
                base0 = (offs_ref[0, 0, grows * k, 0] >> 5) // 128
            _window_deposit(vals, offs, idxv, wl, out_ref, pending,
                            prevr, base0=base0,
                            skip_empty=bool(packed16),
                            pair16=bool(packed16), i8=i8, hbm=hbm_t)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("num_words", "interpret", "zero_init",
                                    "group", "wl"))
def scatter_bits_tpu(vals: jnp.ndarray, nbits: jnp.ndarray,
                     offsets: jnp.ndarray, num_words: int,
                     interpret: bool = False,
                     zero_init: bool = False,
                     group: int = _U, wl: int = _WL) -> jnp.ndarray:
    """Pallas deposit; same contract as scatter_bits (TPU backend only).

    zero_init guarantees words not covered by any deposit window read as
    zero (needed when the unit stream has gaps, e.g. the decoder's
    literal-record expansion); without it, skipped regions are
    unspecified, matching scatter_bits only up to the stream end.
    """
    B, N = vals.shape
    step = _U * _SUB
    T = -(-N // step)
    pad = T * step - N
    if pad:
        # padding units are zero-width at the stream end
        end = offsets[:, -1:] + nbits[:, -1:]
        vals = jnp.concatenate(
            [vals, jnp.zeros((B, pad), vals.dtype)], axis=1)
        nbits = jnp.concatenate(
            [nbits, jnp.zeros((B, pad), nbits.dtype)], axis=1)
        offsets = jnp.concatenate(
            [offsets, jnp.broadcast_to(end, (B, pad))], axis=1)

    wrows = wl // 128
    rows = -(-num_words // 128) + wrows + 1
    sub8 = 8 * _SUB
    vals4 = vals.astype(jnp.uint32).reshape(B, T, sub8, 128)
    offs4 = offsets.astype(jnp.int32).reshape(B, T, sub8, 128)
    in_specs = [
        pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _make_deposit_kernel(group, wl, zero_init),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, 128), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2 * wrows, 128), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(vals4, offs4)
    return out.reshape(B, rows * 128)[:, :num_words]


# Default Mosaic scoped-VMEM budget for the deposit's resident output
# block.  Larger word buffers (a 4K raster's ~25MB) stay VMEM-resident
# with a raised per-kernel vmem_limit_bytes - v5e has 128MB of physical
# VMEM and the 16MB scoped default is just a compiler guardrail; Mosaic
# double-buffers the revolving per-image output block, so the usable
# ceiling is ~half of what the limit leaves after inputs/scratch.
# Rasters past _DEP_SLOTS_MAX route to the XLA decode path (driver gate).
_DEP_VMEM_BYTES = 10 << 20
_DEP_VMEM_LIMIT = 120 << 20   # raised Mosaic scoped limit for big blocks
_DEP_BLOCK_MAX = 54 << 20     # one output block (2 live under the limit)
_DEP_SLOTS_MAX = (_DEP_BLOCK_MAX // 512 - 40) * 256  # ~28M (4K 3ch fits)


@functools.partial(jax.jit,
                   static_argnames=("num_words", "interpret", "group",
                                    "wl", "sub", "i8", "wide"))
def scatter_packed16_tpu(meta: jnp.ndarray, num_words: int,
                         metb: jnp.ndarray | None = None,
                         interpret: bool = False,
                         group: int = 4096, wl: int = 2176,
                         sub: int = int(_os.environ.get(
                             "FPNG_TPU_DEP_SUB", str(_SUB))),
                         i8: bool = _os.environ.get(
                             "FPNG_TPU_DEP_I8", "1") != "0",
                         wide: bool = False) -> jnp.ndarray:
    """Deposit (B, N) packed records - (value9 << 23) | slot23 int32,
    16-bit units at bit offset slot*16, monotone slots - into
    (B, num_words) uint32 words.  Always zero-initialized (the record
    stream has gaps).  In-kernel unpacking spares three O(N) staged
    arrays vs deposit_bits; used by the decoder's literal expansion.

    metb: optional (B, N) second-symbol values (9 bits, 0 = none); each
    rides its record's high half - a 32-bit unit at the same slot - so
    two-symbol walk steps still cost one deposit slot.

    wide: rasters past the 23-bit slot field (up to 2^27 slots): meta is
    the bare slot index, metb (required) carries both pre-shifted values
    (0x100|v1) | ((0x100|s2) << 16), 0 = gap.  Output buffers past the
    VMEM budget automatically take the HBM-output mode (staged windows,
    aliased zero fill) - orthogonal to `wide`, though in practice large
    rasters need both.
    """
    B, N = meta.shape
    if wide:
        assert metb is not None, "wide records require the value plane"
    step = _U * sub
    T = -(-N // step)
    pad = T * step - N
    if pad:
        # final slot (monotone, value 0 - padding deposits nothing)
        end = meta[:, -1:] if wide else meta[:, -1:] & 0x7FFFFF
        meta = jnp.concatenate(
            [meta, jnp.broadcast_to(end, (B, pad))], axis=1)
        if metb is not None:
            metb = jnp.concatenate(
                [metb, jnp.zeros((B, pad), metb.dtype)], axis=1)
    wrows = wl // 128
    rows = -(-num_words // 128) + wrows + 1
    # HBM-output mode (staged window DMAs) is correct in interpret mode
    # but faults on real hardware (axon backend, r5 bisect: isolated
    # DMA-from-while patterns all pass, the full kernel does not) - so
    # big blocks stay VMEM-resident under a raised per-kernel Mosaic
    # scoped limit instead, and the driver routes rasters past
    # _DEP_SLOTS_MAX to the XLA path.  FPNG_TPU_DEP_HBM=1 re-enables
    # the DMA mode for debugging.
    hbm = _os.environ.get("FPNG_TPU_DEP_HBM", "") == "1"
    big_blk = rows * 512 > _DEP_VMEM_BYTES and not hbm
    if big_blk:
        assert rows * 512 <= _DEP_BLOCK_MAX, \
            (num_words, "route rasters past _DEP_SLOTS_MAX to XLA")
    sub8 = 8 * sub
    meta4 = meta.astype(jnp.int32).reshape(B, T, sub8, 128)
    spec = pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [spec]
    args = [meta4]
    mode = True
    if metb is not None:
        in_specs.append(spec)
        args.append(metb.astype(jnp.int32).reshape(B, T, sub8, 128))
        mode = "pair"
    scratch = [
        pltpu.VMEM((2 * wrows, 128), jnp.uint32),
        pltpu.SMEM((1,), jnp.int32),
    ]
    aliases = {}
    if hbm:
        # the whole output rides HBM, zero-filled by aliasing a zeros
        # input; windows are staged through a VMEM scratch + DMA
        aliases = {len(args): 0}
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(jnp.zeros((B, rows, 128), jnp.uint32))
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [pltpu.VMEM((wrows, 128), jnp.uint32),
                    pltpu.SemaphoreType.DMA]
    else:
        out_spec = pl.BlockSpec((1, rows, 128), lambda b, t: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    params = {}
    if big_blk and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_DEP_VMEM_LIMIT)
    out = pl.pallas_call(
        _make_deposit_kernel(group, wl, True, packed16=mode, sub=sub,
                             i8=i8, wide=wide, hbm=hbm),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, rows, 128), jnp.uint32),
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
        **params,
    )(*args)
    return out.reshape(B, rows * 128)[:, :num_words]


def is_tpu_backend() -> bool:
    """True when the default backend drives TPU hardware (incl. axon)."""
    return jax.default_backend() in ("tpu", "axon")


def deposit_bits(vals, nbits, offsets, num_words: int,
                 zero_init: bool = False, group: int = _U, wl: int = _WL):
    """Backend-dispatching bit deposit (Pallas on TPU, scatter elsewhere).

    The Pallas path keeps each image's word buffer resident in VMEM
    (out block = num_words * 4 bytes), so very large single images fall
    back to the XLA scatter.  zero_init: see scatter_bits_tpu (the XLA
    scatter always starts from zeros).
    """
    if is_tpu_backend() and num_words <= 2_000_000:
        return scatter_bits_tpu(vals, nbits, offsets, num_words,
                                zero_init=zero_init, group=group, wl=wl)
    return scatter_bits(vals, nbits, offsets, num_words)
