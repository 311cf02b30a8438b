"""Pallas TPU walk kernel for the chunked speculative decoder.

The XLA formulation of the lockstep walk (ops/specdec.py) spends ~all its
time in per-step gathers, which XLA:TPU runs at ~100 Melem/s.  This kernel
keeps every per-token lookup inside VMEM using the two vector-gather forms
Mosaic supports on (8, 128) tiles:

  * per-lane stream words ride in columns of a (24, 1024) tile, so two
    sublane-dim take_along_axis gathers read each lane's pos-aligned
    32-bit window directly (lanes' streams are private per column);
  * the shared 4096-entry packed LUT is 4 (8, 128) tiles; a lane-dim
    gather (column select) composed with a sublane-dim gather (row select)
    resolves a full 12-bit lookup per 128-lane slice.

One kernel instance walks 1024 chunk lanes of one image (grid (B, NG)),
S = 512-bit chunks, with 8 steps unrolled per loop iteration so record
rows store at sublane-aligned offsets and the ~1.3us/iteration loop tax
amortizes.  Each step consumes up to TWO tokens via the LUT's
speculatively packed second literal (the reference decoder's own trick,
fpng.cpp:2080-2102, see pack_lut) - fewer walk steps AND fewer record
slots.

Pass structure (one full walk total): pass0 records RAW per-step rows
(position, sym/outlen/clen/flags, packed second literal) for every lane
from its byte-aligned guess.  The entry fixpoint then re-walks ONLY
lanes whose corrected entry is absent from their own recorded position
set - a recorded path containing the entry IS the walk from that entry
(deterministic continuation), so self-synchronized lanes never walk
twice; diverged lanes update their record columns in place.  A cheap
finalize kernel (_make_finalize_kernel; no window reads or LUT gathers)
masks each lane's pre-convergence prefix, converts raw rows into
deposit records

  meta = (0x100 | sym) << 23 | data_offset23   primary data literal
         clamped monotone data offset          otherwise
  metb = (0x100 | sym2)                        paired second literal

(data offsets exclude filter-byte slots and pad each row to bpl_pad;
a step's two literals are output-adjacent, so metb rides the same
32-bit deposit unit's high half), and runs the reference's per-record
constraint checks reduced to per-group (fail, eob_end, bad_end)
scalars.  The finish stage is then: packed-pair 16-bit-slot deposit ->
the fused fill+defilter expansion kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from .bitpack import deposit_bits

import os as _os

S_TPU = 512          # chunk bits (walk-kernel path)
# walk-pass lane width: every pass carries three ST8-row record blocks,
# and fixpoint re-walks alias them in+out (6 streamed blocks, double-
# buffered), so 512 lanes keeps the scoped VMEM under the 16MB budget
LPI = int(_os.environ.get("FPNG_TPU_LPI_REC", "512"))
ST8 = S_TPU + 24     # record rows (8-aligned; covers 1-bit/token worst case)
_WPL = S_TPU // 32   # 32-bit stream words per lane (16)
_TILES = 3           # 8-row word-tile count covering _WPL + 2 halo words
_RT = _TILES * 8     # stream tile rows (24; rows 18-23 are padding)


def _make_walk_kernel(lpi: int, guard: bool = True):
    """Kernel factory: lpi lanes per instance, FULL in-kernel fixpoint.

    One launch resolves the entire decode walk.  The sequential TPU grid
    carries the previous group's converged last-lane exit in SMEM
    scratch, so each instance (a) walks its lanes from their byte-
    aligned guesses, (b) iterates the entry fixpoint entirely in VMEM -
    corrected entries come from the predecessor lane's exit (pltpu.roll)
    and the carry, membership tests run against the instance's own
    recorded positions, and only genuinely diverged lanes re-walk,
    overwriting just their record columns - and (c) publishes its last
    exit for the next group before that group's grid step runs.  This
    replaces the former driver-level fixpoint (one RMW pallas launch +
    record-block streaming + group argsort per pass, ~6 passes and
    ~60% of the walk stage on the photo corpus, r4 measurement)."""

    def kernel(rm_ref, zl8_ref, p0_ref, w24_ref, lut_ref, efin_ref,
               posr_ref, raw0_ref, raw1_ref, nst_ref, *scr):
        b = pl.program_id(0)
        g = pl.program_id(1)
        gm = rm_ref[b, g]
        carry_s = scr[-1]

        @pl.when(g == 0)
        def _():
            carry_s[0] = p0_ref[b, 0]

        def run():
            _walk_body(gm, zl8_ref, w24_ref, lut_ref, efin_ref,
                       posr_ref, raw0_ref, raw1_ref, nst_ref, scr, lpi)

        if guard:
            # the scalar-prefetched remap names the ACTUAL group this
            # grid step processes (pass0 skips trailing all-dead groups
            # by repeating the last live one); re-running a duplicate
            # would clobber the carry with a stale value, so the guard
            # is correctness-bearing here (the driver only remaps when
            # guarding is available, i.e. never in interpret mode)
            dup = (g > 0) & (gm == rm_ref[b, jnp.maximum(g - 1, 0)])
            pl.when(~dup)(run)
        else:
            run()

    return kernel


_INF = 0x7FFFFFFF
_MEMB = 32  # fixpoint membership window (= one record-trim granule)


def _walk_body(g, zl8_ref, w24_ref, lut_ref, efin_ref, posr_ref,
               raw0_ref, raw1_ref, nst_ref, scr, LPI):
    pos_s, outl_s, act_s, nst_s, ent_s, exit_s, carry_s = scr
    zl8 = zl8_ref[pl.program_id(0), 0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LPI), 1) + g * LPI
    col = jax.lax.broadcasted_iota(jnp.int32, (8, LPI), 1)
    lane_bit0 = lane * S_TPU
    lane_word0 = lane * _WPL
    bound = jnp.minimum(lane_bit0 + S_TPU, zl8)
    live = lane_bit0 < zl8
    subl = jax.lax.broadcasted_iota(jnp.int32, (8, LPI), 0)

    tiles = [w24_ref[0, 0, 8 * t:8 * (t + 1), :] for t in range(_TILES)]
    luts = [lut_ref[0, t].astype(jnp.int32) for t in range(4)]

    lshr = jax.lax.shift_right_logical

    def step(pos, outl, act):
        # pos-aligned 32-bit window from two word gathers: w holds stream
        # bits [pos, pos+32), so every peek/extra shift is relative to 0
        # (the old byte-granular form needed 9 tile gathers + a per-step
        # sub-byte shift; words need 3 tiles x 2 gathers)
        jw = lshr(pos, 5) - lane_word0
        # select-first (valid on sublane-uniform indices, see the LUT
        # gather): pick each element's word tile by jw>>3, then ONE
        # sublane gather at jw&7 - 2 gathers/step instead of 6.  A
        # garbage entry (< lane start, possible only past the stream's
        # EOB) reads arbitrary in-tile rows instead of the old
        # deterministic 0 - equally garbage, equally masked downstream
        # (records at pos < entry are dropped, outp >= total never
        # deposits into live raster slots).
        jt0 = lshr(jw, 3)
        jt1 = lshr(jw + 1, 3)
        sel0 = tiles[0]
        sel1 = tiles[0]
        for t in range(1, _TILES):
            sel0 = jnp.where(jt0 == t, tiles[t], sel0)
            sel1 = jnp.where(jt1 == t, tiles[t], sel1)
        w_lo = jnp.take_along_axis(sel0, jw & 7, axis=0)
        w_hi = jnp.take_along_axis(sel1, (jw + 1) & 7, axis=0)
        sh = pos & 31
        w = lshr(w_lo, sh) | ((w_hi << (31 - sh)) << 1)
        pk = w & 0xFFF

        col_ = pk & 127
        row = (pk >> 7) & 7
        tid = pk >> 10
        parts = []
        for k in range(LPI // 128):
            cs = col_[:, 128 * k:128 * (k + 1)]
            rs = row[:, 128 * k:128 * (k + 1)]
            ts = tid[:, 128 * k:128 * (k + 1)]
            # column-gather all 4 tiles, select the element's tile by
            # tid, THEN row-gather once.  Valid because every index
            # (cs/rs/ts) is SUBLANE-UNIFORM (the 8 sublanes duplicate
            # one walk lane), so the row gather reads a row whose
            # column/tile choices match its own; saves 3 of 4 sublane
            # gathers per slice
            sel = jnp.take_along_axis(luts[0], cs, axis=1)
            for t in range(1, 4):
                m1 = jnp.take_along_axis(luts[t], cs, axis=1)
                sel = jnp.where(ts == t, m1, sel)
            parts.append(jnp.take_along_axis(sel, rs, axis=0))
        e = jnp.concatenate(parts, axis=1)

        sym = e & 511
        clen = (e >> 9) & 15
        nextra = (e >> 13) & 7
        base = (e >> 16) & 0x1FF
        is_m = (sym > 256) & (sym <= 285)
        extra = lshr(w, clen) & ((1 << nextra) - 1)
        run = base + extra
        stop = clen == 0
        # speculative second literal (pack_lut bits 16-24/25-28): a
        # literal entry whose remaining window bits fully contain another
        # literal code consumes BOTH this step (the reference decoder's
        # own trick, fpng.cpp:2080-2102) - fewer walk steps AND fewer
        # record slots
        l2 = (e >> 25) & 15
        s2 = (e >> 16) & 0xFF
        two = (sym < 256) & ~stop & (l2 > 0)
        tok = clen + jnp.where(is_m, nextra + 1, 0) + jnp.where(two, l2, 0)
        outlen = jnp.where(sym < 256, 1, jnp.where(is_m, run, 0)) + \
            jnp.where(two, 1, 0)

        # RAW record row (finalization - slot math, constraint checks -
        # happens once in the finalize kernel, not once per walk pass):
        #   posr: step-start bit position (doubles as the fixpoint's
        #         visited-position set; fill rows hold 0)
        #   raw0: sym9 | rec<<9 | outlen9<<10 | clen4<<19 | is_m<<23
        #   raw1: (0x100|s2) when the packed second literal was consumed
        rec = act & ~stop
        r0 = (sym | jnp.where(rec, 1 << 9, 0) | (outlen << 10) |
              (clen << 19) | jnp.where(is_m, 1 << 23, 0))
        r1 = jnp.where(rec & two, s2 | 0x100, 0)
        adv = act & ~stop
        new_pos = jnp.where(adv, pos + tok, pos)
        outl = outl + jnp.where(adv, outlen, 0)
        act = adv & (new_pos < bound)
        return new_pos, outl, act, pos, r0, r1

    def walk(wm, first: bool):
        """(Re)walk lanes where wm holds, from ent_s; records, exit and
        nst of all other lanes are preserved (VMEM read-modify-write -
        this instance owns its blocks, so no streaming is involved).

        Mosaic only legalizes while loops with SCALAR carries: vector
        state lives in the scratch refs, the loop carries (iteration,
        any-active)."""
        ent = ent_s[...]
        act0 = wm & (ent < bound) & live
        pos_s[...] = ent
        outl_s[...] = jnp.zeros((8, LPI), jnp.int32)
        act_s[...] = act0.astype(jnp.int32)
        nst_s[...] = jnp.zeros((8, LPI), jnp.int32)

        def wr(ref, it, val):
            if not first:
                old = ref[0, 0, pl.ds(it * 8, 8), :]
                val = jnp.where(wm, val, old)
            ref[0, 0, pl.ds(it * 8, 8), :] = val

        def body(st):
            it, _any = st
            pos = pos_s[...]
            outl = outl_s[...]
            act = act_s[...] != 0
            cnt = nst_s[...]
            g_pos = jnp.zeros((8, LPI), jnp.int32)
            g_r0 = jnp.zeros((8, LPI), jnp.int32)
            g_r1 = jnp.zeros((8, LPI), jnp.int32)
            for u in range(8):
                # a lane's row u is genuine iff the lane was still
                # active entering the step; cnt bounds the lane's live
                # record rows (no trailing fill pass - the finalize
                # kernel masks rows >= nst, so rows past the last
                # written tile may hold garbage or a previous walk's
                # rows)
                cnt = cnt + act.astype(jnp.int32)
                pos, outl, act, spos, r0, r1 = step(pos, outl, act)
                g_pos = jnp.where(subl == u, spos, g_pos)
                g_r0 = jnp.where(subl == u, r0, g_r0)
                g_r1 = jnp.where(subl == u, r1, g_r1)
            wr(posr_ref, it, g_pos)
            wr(raw0_ref, it, g_r0)
            wr(raw1_ref, it, g_r1)
            pos_s[...] = pos
            outl_s[...] = outl
            act_s[...] = act.astype(jnp.int32)
            nst_s[...] = cnt
            return it + 1, jnp.any(act).astype(jnp.int32)

        def cond(st):
            return (st[0] < ST8 // 8) & (st[1] != 0)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

        if first:
            exit_s[...] = pos_s[...]
            nst_ref[0, 0, 0, :] = nst_s[0, :]
        else:
            exit_s[...] = jnp.where(wm, pos_s[...], exit_s[...])
            nst_ref[0, 0, 0, :] = jnp.where(
                wm[0], nst_s[0, :], nst_ref[0, 0, 0, :])

    # pass 0: entries are the byte-aligned guesses; the group's first
    # lane takes the carry (= p0 for the image's first group, else the
    # previous group's converged last exit - which, because the grid is
    # sequential and each instance converges before returning, is FINAL
    # by the time this instance runs)
    ent_s[...] = jnp.where(col == 0,
                           jnp.broadcast_to(carry_s[0], (8, LPI)),
                           lane_bit0)
    walk(jnp.full((8, LPI), True), first=True)

    if _os.environ.get("FPNG_TPU_WALK_ABL") == "nofix":
        # profiling only: skip the entry fixpoint (wrong results)
        efin_ref[0, 0, 0, :] = ent_s[0, :]
        carry_s[0] = jnp.max(jnp.where(col[0:1] == LPI - 1,
                                       exit_s[0:1, :], -_INF))
        return

    def fix_body(st):
        it, _chg = st
        prev_exit = pltpu.roll(exit_s[...], 1, 1)
        e_new = jnp.where(col == 0,
                          jnp.broadcast_to(carry_s[0], (8, LPI)),
                          prev_exit)
        ent = ent_s[...]
        chg = (e_new != ent) & live
        # in-VMEM membership: a lane whose recorded path (or a packed
        # pair's second-token position) already contains its corrected
        # entry is exact by deterministic continuation - the walk from
        # that entry is exactly the recorded suffix, so its exit is
        # already correct and no re-walk is needed.  Only the first
        # _MEMB rows count: a longer garbage prefix would inflate the
        # record-trim bound (and so the deposit volume) for the whole
        # batch, so long-prefix lanes re-walk instead.
        n_old = jnp.broadcast_to(nst_ref[0, 0, 0, :], (8, LPI)) \
            .astype(jnp.int32)
        hit = jnp.zeros((8, LPI), jnp.int32)
        for t4 in range(_MEMB // 8):
            pr = posr_ref[0, 0, 8 * t4:8 * (t4 + 1), :]
            r0r = raw0_ref[0, 0, 8 * t4:8 * (t4 + 1), :]
            r1r = raw1_ref[0, 0, 8 * t4:8 * (t4 + 1), :]
            rlive = subl + 8 * t4 < n_old
            h = (pr == e_new) | \
                ((r1r != 0) & (pr + ((r0r >> 19) & 15) == e_new))
            hit = hit | jnp.max((h & rlive).astype(jnp.int32),
                                axis=0, keepdims=True)
        member = jnp.broadcast_to(hit[0:1] > 0, (8, LPI))
        ent_s[...] = jnp.where(chg, e_new, ent)
        walk(chg & ~member, first=False)
        return it + 1, jnp.max(chg.astype(jnp.int32))

    def fix_cond(st):
        return (st[0] < LPI + 2) & (st[1] != 0)

    jax.lax.while_loop(fix_cond, fix_body, (jnp.int32(0), jnp.int32(1)))

    efin_ref[0, 0, 0, :] = ent_s[0, :]
    # publish the group's converged last-lane exit for the next group
    carry_s[0] = jnp.max(jnp.where(col[0:1] == LPI - 1,
                                   exit_s[0:1, :], -_INF))


@functools.partial(jax.jit, static_argnames=("ng", "lpi", "interpret"))
def walk_fix_tpu(w24t, lutp4, p0, zl8, remap=None, *, ng: int,
                 lpi: int = LPI, interpret: bool = False):
    """The complete decode walk - guess pass + entry fixpoint - in ONE
    pallas launch (see _make_walk_kernel).

    w24t: (B, NG, 24, lpi) int32 per-lane stream-word tiles;
    lutp4: (B, 4, 8, 128) int32 packed LUT tiles;
    p0: (B,) int32 first-token bit position; zl8: (B, 1) int32 stream
    bit length.  remap (B, NG) int32 reorders which group each grid
    step processes (scalar-prefetched so block index maps follow it):
    pass0 puts live groups first and repeats the last one, so trailing
    all-dead groups cost no block traffic; duplicate steps skip the
    body entirely (the guard is correctness-bearing for the carry, so
    remap must be None in interpret mode).
    Returns (efin, posr, raw0, raw1, nst): records raw, (B, NG, ST8,
    lpi) - see _walk_body for the row encoding; nst (B, NG, 1, lpi)
    counts each lane's live record rows (rows >= nst are unwritten
    garbage - there is no fill pass); efin (B, NG, 1, lpi) is each
    lane's converged entry.
    """
    B = w24t.shape[0]
    guard = not interpret
    if remap is None:
        remap = jnp.broadcast_to(
            jnp.arange(ng, dtype=jnp.int32)[None, :], (B, ng))
    else:
        assert guard, "remap requires the dup guard (not interpret mode)"

    def gmap(spec):
        # index map following the prefetched remap for per-group blocks
        return lambda b, g, rm: spec(b, rm[b, g])

    rec_spec = pl.BlockSpec((1, 1, ST8, lpi),
                            gmap(lambda b, g: (b, g, 0, 0)),
                            memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, 1, 1, lpi),
                             gmap(lambda b, g: (b, g, 0, 0)),
                             memory_space=pltpu.VMEM)
    out_specs = (lane_spec, rec_spec, rec_spec, rec_spec, lane_spec)
    out_shape = (
        jax.ShapeDtypeStruct((B, ng, 1, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, ST8, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, ST8, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, ST8, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, 1, lpi), jnp.int32),
    )
    scratch = [pltpu.VMEM((8, lpi), jnp.int32) for _ in range(6)] + \
        [pltpu.SMEM((1,), jnp.int32)]
    in_specs = [
        pl.BlockSpec((B, 1), lambda b, g, rm: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((B, 1), lambda b, g, rm: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, _RT, lpi),
                     gmap(lambda b, g: (b, g, 0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 8, 128), lambda b, g, rm: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, ng),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        _make_walk_kernel(lpi, guard=guard),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(remap.astype(jnp.int32), zl8.astype(jnp.int32),
      p0.astype(jnp.int32).reshape(B, 1), w24t, lutp4)


def _lane_tiles(stream, nc_pad: int):
    """(B, Nb) uint8 -> (B, NC, _RT) int32 per-lane LE 32-bit words.

    Row r < 16 holds the lane's stream word r; rows 16-17 are the next
    lane's first two words (halo - a walk may peek up to ~20 bits past
    its chunk); rows 18-23 pad to the 8-row tile granularity.
    """
    B, nb = stream.shape
    nw = (nc_pad + 1) * _WPL
    pad = 4 * nw - nb
    sp = jnp.pad(stream, ((0, 0), (0, max(pad, 0))))
    # LE byte->word pack as ONE bitcast: the shift-or form forced XLA
    # into four stride-4 uint8 slices and dominated the walk stage
    # (~11.6ms of the 31ms at 32x512x512x3, measured r4)
    w32 = jax.lax.bitcast_convert_type(
        sp[:, :4 * nw].reshape(B, nw, 4), jnp.uint32).astype(jnp.int32)
    base = w32[:, :nc_pad * _WPL].reshape(B, nc_pad, _WPL)
    halo = w32[:, _WPL:(nc_pad + 1) * _WPL].reshape(
        B, nc_pad, _WPL)[:, :, :2]
    return jnp.concatenate(
        [base, halo, jnp.zeros((B, nc_pad, _RT - _WPL - 2), jnp.int32)],
        axis=2)                                            # (B, NC, _RT)


def _prep_w24_tiles(stream, nc_pad: int, lpi: int, tiles=None):
    """(B, Nb) uint8 -> (B, NG, 24, lpi) int32 per-lane word tiles."""
    B = stream.shape[0]
    if tiles is None:
        tiles = _lane_tiles(stream, nc_pad)
    ng = nc_pad // lpi
    return jnp.swapaxes(tiles.reshape(B, ng, lpi, _RT), 2, 3), ng


def _bpl_pad(bpl: int) -> int:
    """Data-raster row padding: multiples of 256 slots so the expansion
    kernel's (8, bpl_pad/2)-word blocks tile on 128 lanes.  Skinny rows
    stay unpadded (they take the XLA expansion, where padding would
    inflate the deposit's offset span instead)."""
    return bpl if bpl < 256 else -(-bpl // 256) * 256


@functools.partial(
    jax.jit, static_argnames=("nc_pad", "ncg_live", "interpret"))
def _decode_walk(stream, lutp, p0, zlib_len, *, nc_pad: int,
                 ncg_live: int | None = None, interpret: bool = False):
    """Stage 1: the complete walk + entry fixpoint (ONE pallas launch).

    The kernel records every lane's walk from its byte-aligned guess
    and converges the entry fixpoint in-kernel (see _make_walk_kernel):
    the recorded step positions are each lane's VISITED set - when a
    lane's corrected entry appears among its own recorded positions,
    the walk from that entry is exactly the recorded suffix
    (deterministic continuation), so its exit is already correct and NO
    re-walk is needed; only genuinely diverged lanes (periodic content
    defeating self-synchronization) re-walk, updating their record
    columns in place in VMEM.  Pre-convergence garbage rows are masked
    downstream by `pos < entry` (positions are monotone, and a lane
    whose path skipped over its entry fails membership and re-walks,
    so the mask is exact).

    Returns (posr, raw0, raw1, nst, e_fin, out0, steps, fix_passes) -
    records RAW in (B, NG, ST8, LPI) kernel layout; the finalize
    kernel (stage 2) turns them into deposit records + checks.  nst
    bounds each lane's live rows (no fill pass - rows >= nst are
    garbage and every consumer masks them).
    """
    B = stream.shape[0]
    NC = nc_pad
    zl8 = (zlib_len * 8).reshape(B, 1)
    lutp4 = lutp.astype(jnp.uint32).reshape(B, 4, 8, 128).astype(jnp.int32)

    starts = (jnp.arange(NC, dtype=jnp.int32) * S_TPU)[None, :]
    dead = starts >= zl8

    w24r, ngr = _prep_w24_tiles(stream, NC, LPI)

    # pass0 live-group remap: all-dead trailing groups of the coarse
    # walk bucket stream no blocks and run no iterations (their record
    # blocks stay unwritten garbage; every consumer below masks by
    # `dead`, and the finish stages never visit them).  Interpret mode
    # cannot lower the dup guard, which is correctness-bearing for the
    # kernel's cross-group carry - no remap there (CPU test cost only).
    remap0 = None
    if not interpret and ncg_live is not None and ncg_live < ngr:
        r0 = np.concatenate([
            np.arange(ncg_live, dtype=np.int32),
            np.full(ngr - ncg_live, ncg_live - 1, np.int32)])
        remap0 = jnp.broadcast_to(r0[None, :], (B, ngr))
    e_fin4, posr, raw0, raw1, nst = walk_fix_tpu(
        w24r, lutp4, p0, zl8, remap=remap0, ng=ngr, lpi=LPI,
        interpret=interpret)
    e_fin = e_fin4.reshape(B, NC)
    rowi = jnp.arange(ST8, dtype=jnp.int32).reshape(1, 1, ST8, 1)

    # per-lane output byte counts from the VALID record rows (rec flag
    # set, row live, and position at/after the lane's final entry)
    nv = e_fin.reshape(B, ngr, 1, LPI)
    live = (~dead).reshape(B, ngr, 1, LPI)
    recb = ((raw0 >> 9) & 1) * live * (rowi < nst)
    validr = (recb * (posr >= nv)).astype(jnp.int32)
    # pair rows whose SECOND token is the converged entry count as one
    # demoted literal (the finalize emits just s2 for them)
    dem = (recb * (raw1 != 0) * (posr < nv) *
           (posr + ((raw0 >> 19) & 15) == nv)).astype(jnp.int32)
    outl_f = (raw0 >> 10) & 511
    outb = jnp.sum(validr * outl_f + dem * (outl_f - 1),
                   axis=2).reshape(B, NC)
    outb = jnp.where(dead, 0, outb)
    out0 = jnp.cumsum(outb, axis=1) - outb
    # record-trim bound = last valid row (garbage prefixes are bounded
    # by _MEMB, so this tracks real token counts, not guess-walk lengths)
    steps = jnp.max((validr | dem) * (rowi + 1), axis=(2, 3))
    return posr, raw0, raw1, nst, e_fin, out0, steps, jnp.int32(1)


def _divmod_const(x, d: int):
    """Exact floor divmod by a constant inside a kernel.

    Mosaic lowers s32 division to a long instruction sequence; a f32
    reciprocal multiply plus a +-1 correction is exact for |x| < 2^24
    (f32 mantissa covers the estimate; the correction absorbs rounding
    and the trunc-vs-floor difference for x < 0)."""
    if d & (d - 1) == 0:
        sh = d.bit_length() - 1
        return x >> sh, x & (d - 1)
    q = (x.astype(jnp.float32) * np.float32(1.0 / d)).astype(jnp.int32)
    r = x - q * d
    q = q + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q, x - q * d


def _make_finalize_kernel(k8: int, lpi: int, geom, gchunk: int,
                          wide: bool = False):
    """Raw records -> finalized deposit records + constraint checks.

    Runs once over the k8 trimmed record rows per lane - pure VMEM
    arithmetic, no window reads or LUT gathers (the expensive walk
    machinery runs only in the walk passes).  Port of the reference's
    per-record validation (fpng.cpp:2257-2584 semantics) and of the
    deposit-record packing previously done inside the record walk:

      meta = (0x100 | sym) << 23 | clamped padded data-slot offset
      metb = (0x100 | s2) for a consumed packed second literal

    wide (rasters past the 23-bit slot field, up to 2^27 slots):
      meta = bare slot offset
      metb = (0x100 | v1) | ((0x100 | s2) << 16), 0 = gap

    Rows with position below the lane's final entry are the lane's
    pre-convergence garbage prefix and are treated as no-ops (they
    still emit the monotone fill offset the deposit needs).
    """
    row_stride, total, cch, bpl_pad = geom
    bpl = row_stride - 1
    hbplp = (total // row_stride) * bpl_pad

    def body(gc, posr_ref, raw0_ref, raw1_ref, ent_ref, out0_ref,
             nst_ref, meta_ref, metb_ref):
        meta_tiles = []
        metb_tiles = []
        e_l = jnp.broadcast_to(ent_ref[0, gc, 0],
                               (8, lpi)).astype(jnp.int32)
        o0 = jnp.broadcast_to(out0_ref[0, gc, 0],
                              (8, lpi)).astype(jnp.int32)
        n_l = jnp.broadcast_to(nst_ref[0, gc, 0],
                               (8, lpi)).astype(jnp.int32)
        subl = jax.lax.broadcasted_iota(jnp.int32, (8, lpi), 0)

        carry = o0
        fail = jnp.zeros((8, lpi), bool)
        eobm = jnp.full((8, lpi), _INF, jnp.int32)
        badm = jnp.full((8, lpi), _INF, jnp.int32)
        for t in range(k8 // 8):
            p = posr_ref[0, gc, 8 * t:8 * (t + 1), :]
            r0 = raw0_ref[0, gc, 8 * t:8 * (t + 1), :]
            r1 = raw1_ref[0, gc, 8 * t:8 * (t + 1), :]
            # live rows only: row index below the lane's recorded count
            # (rows past it are unwritten garbage - there is no fill
            # pass), at/after the converged entry (pre-convergence
            # prefix), and flagged as a record by the walk
            recbit = (((r0 >> 9) & 1) == 1) & (subl + 8 * t < n_l)
            sym = r0 & 511
            outlen = (r0 >> 10) & 511
            clen = (r0 >> 19) & 15
            is_m = ((r0 >> 23) & 1) == 1
            s2 = r1 & 0xFF
            # pair row whose SECOND token is the entry: demote to that
            # literal alone (the first literal precedes convergence; the
            # fixpoint's membership admitted the lane on this position)
            dem = recbit & (r1 != 0) & (p < e_l) & (p + clen == e_l)
            rec = (recbit & (p >= e_l)) | dem
            sym = jnp.where(dem, s2, sym)
            outlen = jnp.where(dem, 1, outlen)
            two = rec & (r1 != 0) & ~dem

            # per-lane output positions: exclusive prefix of outlen over
            # the 8 step rows (Kogge-Stone over sublanes) + row carry
            ol = jnp.where(rec, outlen, 0)
            s = ol
            for shf in (1, 2, 4):
                s = s + jnp.where(subl >= shf, pltpu.roll(s, shf, 0), 0)
            outp = carry + s - ol
            carry = carry + jnp.broadcast_to(s[7:8, :], (8, lpi))

            q, rowpos = _divmod_const(outp, row_stride)
            lit = rec & (sym < 256) & (rowpos != 0)
            didx = jnp.clip(q * bpl_pad + rowpos - 1, 0, hbplp)
            # second literal: rides the primary unit's high half unless
            # the FIRST symbol sits on a filter byte, in which case s2
            # becomes the primary record at its own slot
            rowpos2 = rowpos + 1
            rowpos2 = jnp.where(rowpos2 == row_stride, 0, rowpos2)
            lit2 = two & (rowpos2 != 0)
            lit2_only = lit2 & ~lit
            didx2 = jnp.clip(q * bpl_pad + rowpos2 - 1, 0, hbplp)
            prim = lit | lit2_only
            v1 = jnp.where(lit, sym, s2)
            off = jnp.where(lit2_only, didx2, didx)
            if wide:
                meta_tiles.append(off)
                metb_tiles.append(
                    jnp.where(prim, v1 | 0x100, 0) |
                    jnp.where(lit & lit2, (s2 | 0x100) << 16, 0))
            else:
                meta_tiles.append(
                    off | jnp.where(prim, (v1 | 0x100) << 23, 0))
                metb_tiles.append(jnp.where(lit & lit2, s2 | 0x100, 0))

            live = rec & (outp < total)
            x = rowpos - 1
            f = live & (sym > 285)
            at_filter = live & (rowpos == 0)
            fexp = jnp.where(outp >= row_stride, 2, 0)
            f |= at_filter & ((sym >= 256) | (sym != fexp))
            run = outlen  # for match records outlen IS the run length
            _, xc = _divmod_const(x, cch)
            _, rc = _divmod_const(run, cch)
            mok = (rowpos >= 1) & (xc == 0) & (rc == 0) & (x + run <= bpl)
            f |= (live & is_m) & ~mok
            misal = live & (rowpos >= 1) & (xc != 0)
            f |= misal & (sym >= 256)
            f |= live & (sym == 256)
            at_total = rec & (outp == total)
            at_eob = at_total & (sym == 256)
            fail = fail | f
            eobm = jnp.minimum(eobm, jnp.where(at_eob, p + clen, _INF))
            badm = jnp.minimum(
                badm, jnp.where(at_total & (sym != 256), p, _INF))
            outp2 = outp + 1
            live2 = two & (outp2 < total)
            at_filter2 = live2 & (rowpos2 == 0)
            fexp2 = jnp.where(outp2 >= row_stride, 2, 0)
            fail = fail | (at_filter2 & (s2 != fexp2))
            at_total2 = two & (outp2 == total)
            badm = jnp.minimum(
                badm, jnp.where(at_total2, p + clen, _INF))
        # store records TRANSPOSED - (lane, step) - so the deposit's
        # flat lane-major unit stream needs no XLA transpose pass (the
        # in-VMEM relayout here is far cheaper than the HBM round-trip)
        meta_ref[0, 0, gc, 0] = jnp.swapaxes(
            jnp.concatenate(meta_tiles, axis=0), 0, 1)
        metb_ref[0, 0, gc, 0] = jnp.swapaxes(
            jnp.concatenate(metb_tiles, axis=0), 0, 1)
        return fail, eobm, badm

    def kernel(posr_ref, raw0_ref, raw1_ref, ent_ref, out0_ref, nst_ref,
               meta_ref, metb_ref, chk_ref):
        # gchunk groups per grid step (amortizes per-step fixed cost);
        # the three check reductions only feed per-IMAGE any/min logic
        # downstream, so they combine freely across the chunk's groups
        failc = jnp.int32(0)
        eobc = jnp.full((8, lpi), _INF, jnp.int32)
        badc = jnp.full((8, lpi), _INF, jnp.int32)
        for gc in range(gchunk):
            fail, eobm, badm = body(gc, posr_ref, raw0_ref, raw1_ref,
                                    ent_ref, out0_ref, nst_ref,
                                    meta_ref, metb_ref)
            failc = jnp.maximum(failc, jnp.max(fail.astype(jnp.int32)))
            eobc = jnp.minimum(eobc, eobm)
            badc = jnp.minimum(badc, badm)

        # (fail, eob_end, bad_end) ride lanes 0-2 of a VMEM (8, lpi) tile
        # (an SMEM (B, ng, nls, 3) array pads past the 1MB SMEM budget)
        l128 = jax.lax.broadcasted_iota(jnp.int32, (8, lpi), 1)
        chkv = jnp.where(
            l128 == 0, failc,
            jnp.where(l128 == 1, jnp.min(eobc),
                      jnp.where(l128 == 2, jnp.min(badc), 0)))
        chk_ref[0, 0, :, :] = chkv

    return kernel


_LSF = 128  # finalize lane-slice width (keeps k8-row blocks in VMEM)


def _finalize_records(posr, raw0, raw1, nst, e_fin, out0, *, k8: int,
                      geom, ncg: int | None = None,
                      interpret: bool = False, wide: bool = False):
    """(B, NG, ST8, LPI) raw records -> (meta, metb, chk).

    Lanes are fully independent here (the only cross-row op is the
    per-lane Kogge-Stone over sublanes), so the grid slices the lane
    dim into _LSF-wide blocks to keep k8 x lanes VMEM-resident.

    Both trims are ZERO-COPY: the k8 row trim and the ncg live-group
    trim are applied by the BLOCK index maps (blocks only ever visit
    rows < k8 of groups < ncg), not by slicing the record arrays - an
    eager slice of the (B, NG, ST8, LPI) arrays costs GBs of HBM copy.
    """
    B, ng_full, _, lpi = posr.shape
    ng = ng_full if ncg is None else ncg
    nls = lpi // _LSF
    # groups per grid step: big enough to amortize per-step fixed cost,
    # small enough that 5 streamed (gchunk, k8, 128) blocks fit the
    # 16MB scoped-VMEM budget (gchunk*k8 = 1152 rows measured ~10MB;
    # 1280 keeps margin - 1536 OOMed at ng=20/k8=96).  Interpret mode
    # has no dispatch overhead to amortize - keep the unrolled program
    # small (large unrolls have crashed the XLA:CPU compiler)
    gchunk = 1 if interpret else max(1, 1280 // max(k8, 1))
    while ng % gchunk:
        gchunk -= 1
    ngc = ng // gchunk
    rec_spec = pl.BlockSpec((1, gchunk, k8, _LSF),
                            lambda b, g, ls: (b, g, 0, ls),
                            memory_space=pltpu.VMEM)
    # transposed record output: (lane, step) within each lane-slice, laid
    # out (B, ngc, gchunk, nls, _LSF, k8) so the flat (B, N) view is
    # exactly the deposit's lane-major unit order (group, lane, step)
    rec_t_spec = pl.BlockSpec((1, 1, gchunk, 1, _LSF, k8),
                              lambda b, g, ls: (b, g, 0, ls, 0, 0),
                              memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, gchunk, 1, _LSF),
                             lambda b, g, ls: (b, g, 0, ls),
                             memory_space=pltpu.VMEM)
    meta, metb, chk = pl.pallas_call(
        _make_finalize_kernel(k8, _LSF, geom, gchunk, wide=wide),
        grid=(B, ngc, nls),
        in_specs=[rec_spec, rec_spec, rec_spec, lane_spec, lane_spec,
                  lane_spec],
        out_specs=(
            rec_t_spec, rec_t_spec,
            pl.BlockSpec((1, 1, 8, _LSF),
                         lambda b, g, ls: (b, g * nls + ls, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, ngc, gchunk, nls, _LSF, k8),
                                 jnp.int32),
            jax.ShapeDtypeStruct((B, ngc, gchunk, nls, _LSF, k8),
                                 jnp.int32),
            jax.ShapeDtypeStruct((B, ngc * nls, 8, _LSF), jnp.int32),
        ),
        interpret=interpret,
    )(posr, raw0, raw1, e_fin.reshape(B, ng_full, 1, lpi),
      out0.reshape(B, ng_full, 1, lpi), nst)
    return meta, metb, chk[:, :, 0, :3]


def _make_expand_kernel(P: int, c: int, w: int, wrows: int,
                        tchunk: int = 1):
    """Fill + defilter over the deposited 16-bit-slot data raster.

    Input block: (1, 8*tchunk, P) int32 words = 8*tchunk image rows of
    bpl_pad slots (slot = sym | lit<<8; two slots per word).  tchunk
    8-row tiles are processed per grid step (a tiny per-tile grid paid
    ~3us/step of fixed dispatch cost - most of the kernel's runtime).
    Per tile: match forward-fill along each row (log-distance scan at
    slot stride c, split over the lo/hi word halves), then defilter
    (add the previous row mod 256, carried across tiles/steps), then
    the caller extracts the even bytes in one XLA pass.
    """

    def kernel(dep_ref, out_ref, carry_lo, carry_hi):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            carry_lo[...] = jnp.zeros_like(carry_lo)
            carry_hi[...] = jnp.zeros_like(carry_hi)

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, P), 1)

        def pull(v, hs, d):
            pv = pltpu.roll(v, d, 1)
            ph = jnp.where(lane >= d, pltpu.roll(hs, d, 1), 0)
            return pv, ph

        def fstep(v, hs, pv, ph):
            return (jnp.where(hs == 1, v, jnp.where(ph == 1, pv, v)),
                    hs | ph)

        prev_lo = carry_lo[0:1, :]
        prev_hi = carry_hi[0:1, :]
        for t2 in range(tchunk):
            wv = dep_ref[0, 8 * t2:8 * (t2 + 1), :]
            v_lo = wv & 0xFF
            h_lo = (wv >> 8) & 1
            v_hi = (wv >> 16) & 0xFF
            h_hi = (wv >> 24) & 1

            d = c  # slot distance
            if c == 3:
                # odd first step crosses halves: even slot 2j pulls odd
                # slot 2j-3 (hi, lane j-2); odd slot 2j+1 pulls even
                # 2j-2 (lo, lane j-1)
                pv_l, ph_l = pull(v_hi, h_hi, 2)
                pv_h, ph_h = pull(v_lo, h_lo, 1)
                v_lo, h_lo = fstep(v_lo, h_lo, pv_l, ph_l)
                v_hi, h_hi = fstep(v_hi, h_hi, pv_h, ph_h)
                d = 6
            while d < 2 * w * c:  # cover the whole row chain
                dl = d // 2  # even slot distance -> lane shift per half
                pv_l, ph_l = pull(v_lo, h_lo, dl)
                pv_h, ph_h = pull(v_hi, h_hi, dl)
                v_lo, h_lo = fstep(v_lo, h_lo, pv_l, ph_l)
                v_hi, h_hi = fstep(v_hi, h_hi, pv_h, ph_h)
                d *= 2

            # defilter: row r += defiltered row r-1 (mod 256 per byte)
            rows_lo = []
            rows_hi = []
            for r in range(8):
                prev_lo = (v_lo[r:r + 1, :] + prev_lo) & 0xFF
                prev_hi = (v_hi[r:r + 1, :] + prev_hi) & 0xFF
                rows_lo.append(prev_lo)
                rows_hi.append(prev_hi)
            d_lo = jnp.concatenate(rows_lo, axis=0)
            d_hi = jnp.concatenate(rows_hi, axis=0)

            # keep the 16-bit-slot layout (byte compaction needs
            # cross-vreg lane gathers Mosaic doesn't lower)
            out_ref[0, 8 * t2:8 * (t2 + 1), :] = d_lo | (d_hi << 16)
        carry_lo[0:1, :] = prev_lo
        carry_hi[0:1, :] = prev_hi

    return kernel


@functools.partial(
    jax.jit, static_argnames=("h", "w", "c", "bpl_pad", "interpret"))
def expand_tpu(dep, *, h: int, w: int, c: int, bpl_pad: int,
               interpret: bool = False):
    """(B, H8*P) int32 deposited slot words -> (B, h, w, c) uint8."""
    B = dep.shape[0]
    P = bpl_pad // 2
    H8 = -(-h // 8) * 8
    wrows = P // 128
    dep3 = dep.reshape(B, H8, P)
    # tiles per grid step: the per-tile grid paid ~3us/step of fixed
    # dispatch cost (most of this kernel's runtime); 8 unrolled tiles
    # per step cuts that 8x while keeping the unrolled Mosaic program
    # and the streamed blocks (8*tchunk*P words) bounded
    tchunk = 1 if interpret else max(1, min(H8 // 8, 8, 65536 // P))
    while (H8 // 8) % tchunk:
        tchunk -= 1
    out = pl.pallas_call(
        _make_expand_kernel(P, c, w, wrows, tchunk),
        grid=(B, H8 // (8 * tchunk)),
        in_specs=[pl.BlockSpec((1, 8 * tchunk, P), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8 * tchunk, P), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H8, P), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.int32),
            pltpu.VMEM((8, P), jnp.int32),
        ],
        interpret=interpret,
    )(dep3)
    slots = jax.lax.bitcast_convert_type(out, jnp.uint8) \
        .reshape(B, H8, 4 * P)[:, :h, 0::2]
    return slots[:, :, :w * c].reshape(B, h, w, c)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "c", "nc_pad", "ncl", "k8", "interpret"))
def _decode_finish(posr, raw0, raw1, nst, e_fin, out0, zlib_len, *,
                   h: int, w: int, c: int, nc_pad: int, k8: int,
                   ncl: int | None = None, interpret: bool = False):
    """Stage 2: finalize raw records (checks + deposit packing), then
    deposit + reconstruction.

    ncl trims the finish to the batch's live lanes (trailing all-dead
    groups of the walk's coarse nc_pad bucket); the trim happens in the
    finalize grid's index maps, never as an array slice.
    """
    B = posr.shape[0]
    NC = nc_pad if ncl is None else ncl
    row_stride = 1 + w * c
    total = h * row_stride

    from .bitpack import is_tpu_backend as _is_tpu

    # rasters past the 23-bit packed slot field emit wide records (bare
    # slot + value plane) - same traffic, 2^27-slot reach (the 4K class
    # the reference fast-decodes, fpng.cpp:2969-2971)
    wide = h * _bpl_pad(w * c) >= (1 << 23)
    meta4, metb4, chk = _finalize_records(
        posr, raw0, raw1, nst, e_fin, out0, k8=k8,
        geom=(row_stride, total, c, _bpl_pad(w * c)), ncg=NC // LPI,
        interpret=interpret or not _is_tpu(), wide=wide)

    fail_g = chk[:, :, 0]
    eob_end = jnp.min(chk[:, :, 1], axis=1)
    bad_end = jnp.min(chk[:, :, 2], axis=1)
    ok = ~jnp.any(fail_g != 0, axis=1)
    ok &= eob_end != _INF
    ok &= eob_end <= bad_end
    ok &= ((eob_end + 7) >> 3) == (zlib_len - 4)

    # records arrive finalized AND transposed - the finalize kernel's
    # (B, ngc, gchunk, nls, _LSF, k8) layout flattens directly to the
    # deposit's lane-major unit order: (0x100|sym) << 23 | clamped
    # DATA-SPACE offset (filter-byte slots excluded, rows padded to
    # bpl_pad) for data literals, bare offset otherwise (walks that
    # stopped early leave bytes unproduced; the EOB/coverage checks
    # reject those streams).  The deposit output is the contiguous
    # padded delta raster - no strided filter-slot stripping anywhere.
    meta = meta4.reshape(B, NC, k8)
    metb = metb4.reshape(B, NC, k8)
    n_rec = NC * k8
    bpl = w * c
    bpl_pad = _bpl_pad(bpl)
    hbplp = h * bpl_pad
    from .bitpack import is_tpu_backend, scatter_packed16_tpu

    use_kernel = (is_tpu_backend() or interpret) and bpl_pad % 256 == 0
    H8 = -(-h // 8) * 8
    dep_words = H8 * (bpl_pad // 2) if use_kernel \
        else -(-(16 * (hbplp + 2)) // 32) + 1
    if is_tpu_backend() or interpret:
        # packed records flow straight into the deposit kernel (values
        # and slot unpacked in VMEM - no staged rs/nbits/offset arrays);
        # a step's second literal rides the same unit's high half
        dep = scatter_packed16_tpu(meta.reshape(B, n_rec), dep_words,
                                   metb=metb.reshape(B, n_rec),
                                   interpret=interpret, wide=wide)
    elif wide:
        rs = metb.astype(jnp.uint32).reshape(B, n_rec)
        ro = meta.reshape(B, n_rec)
        dep = deposit_bits(rs, jnp.where(rs != 0, 32, 0), ro * 16,
                           dep_words, zero_init=True, group=2048, wl=1152)
    else:
        mu = jax.lax.bitcast_convert_type(meta, jnp.uint32)
        rs = ((mu >> 23) |
              ((metb.astype(jnp.uint32) & 0x1FF) << 16)).reshape(B, n_rec)
        ro = (mu & 0x7FFFFF).astype(jnp.int32).reshape(B, n_rec)
        dep = deposit_bits(rs, jnp.where(rs != 0, 32, 0), ro * 16,
                           dep_words, zero_init=True, group=2048, wl=1152)

    if use_kernel:
        imgs = expand_tpu(jax.lax.bitcast_convert_type(dep, jnp.int32),
                          h=h, w=w, c=c, bpl_pad=bpl_pad,
                          interpret=interpret)
        return imgs, ok

    pairs = jax.lax.bitcast_convert_type(dep, jnp.uint8) \
        .reshape(B, dep_words * 4)[:, :2 * hbplp] \
        .reshape(B, h, bpl_pad, 2)
    syms_px = pairs[:, :, :bpl, 0].reshape(B, h, w, c)
    plit = pairs[:, :, :bpl, 1].reshape(B, h, w, c)[..., 0] > 0
    payload = jnp.zeros((B, h, w), jnp.int32)
    for k in range(c):
        payload = payload | (syms_px[..., k].astype(jnp.int32) << (8 * k))

    def fill_combine(a, b):
        (pa, fa), (pb, fb) = a, b
        return jnp.where(fb, pb, pa), fa | fb

    filled, _ = jax.lax.associative_scan(
        fill_combine, (payload, plit), axis=2)
    deltas = jnp.stack([(filled >> (8 * k)) & 0xFF for k in range(c)],
                       axis=-1).astype(jnp.int32)
    imgs = jnp.cumsum(deltas, axis=1).astype(jnp.uint8)
    return imgs, ok


_K8_CACHE: dict = {}
_K8_STALE = 8  # consecutive smaller-bound batches before the cache decays


def decode_kernel_tpu(stream, lutp, p0, zlib_len, *, h: int, w: int, c: int,
                      nc_pad: int, zlib_len_max: int | None = None,
                      interpret: bool = False):
    """TPU decode via the Pallas walk kernel; same contract as
    specdec.decode_kernel (without overflow - S=512 cannot overflow).

    Host-orchestrated in two jitted stages so the record rows can be
    trimmed to the actually-used step count (a 32-step bucket) before
    the expansion stage - most streams use a small fraction of the
    static ST8 bound.  The trim bound is cached per geometry: steady-
    state calls dispatch the finish with the cached bound immediately
    and let the steps readback (which costs a device round-trip)
    overlap the finish execution, re-running only on the rare batch
    whose walks ran deeper than anything seen before.
    """
    import numpy as _np

    # deposit slot offsets are 16-bit-unit indices; wide records carry
    # them bare in int32 and the deposit computes bit offsets slot*16,
    # so the padded raster caps at 2^27 slots (~44 MPix at 3ch - the
    # reference's own limit is 2^30 px total, fpng.cpp:2969-2971;
    # beyond 2^27 the driver routes via the XLA kernel)
    assert h * _bpl_pad(w * c) < (1 << 27), \
        "raster too large for the walk path (route via the XLA kernel)"
    # live-group trim: nc_pad is the WALK's compile bucket (coarse
    # {1,1.5}x pow2 ladder), but trailing all-dead groups contribute
    # nothing - pass0 skips them via its remap, and the finish stages
    # (finalize/deposit volume scale with record slots) trim them in
    # their index maps (zero-copy), at a finer 4-group granule (the
    # finish recompiles per (ncl, k8) anyway; 4 groups bounds that at
    # ~6 variants per walk bucket).  Callers pass zlib_len_max from
    # their host-side metadata: np.asarray on the device zlib_len costs
    # a dispatch round-trip per call on remote rigs.
    zmax = zlib_len_max if zlib_len_max is not None \
        else int(_np.asarray(zlib_len).max())
    nc_live = max(int(-(-zmax * 8 // S_TPU)), 1)
    ncl = min(-(-nc_live // (4 * LPI)) * 4 * LPI, nc_pad)
    posr, raw0, raw1, nst, e_fin, out0, steps, _fp = _decode_walk(
        stream, lutp, p0, zlib_len, nc_pad=nc_pad, ncg_live=ncl // LPI,
        interpret=interpret)

    def trim(smax):
        # 16-step granularity (vs pow2): measured lane depths cluster
        # tightly (p50..max = 55..73 on the photo corpus), so a finer
        # granule directly cuts dead record slots through the whole
        # finish; recompile count stays bounded because content keeps
        # the bound stable
        return min(-(-max(smax, 8) // 16) * 16 if smax > 8 else 8, ST8)

    key = (h, w, c, nc_pad)
    ent = _K8_CACHE.get(key)
    if ent is None:
        smax = int(_np.asarray(steps).max())
        k8 = trim(smax)
        _K8_CACHE[key] = [k8, 0]
        return _decode_finish(posr, raw0, raw1, nst, e_fin, out0,
                              zlib_len, h=h, w=w, c=c, nc_pad=nc_pad,
                              k8=k8, ncl=ncl, interpret=interpret)
    k8 = ent[0]
    out = _decode_finish(posr, raw0, raw1, nst, e_fin, out0, zlib_len,
                         h=h, w=w, c=c, nc_pad=nc_pad, k8=k8, ncl=ncl,
                         interpret=interpret)
    smax = int(_np.asarray(steps).max())  # overlaps the finish dispatch
    if smax <= k8:
        # decay: after _K8_STALE consecutive batches that needed a
        # smaller bound, drop to the current batch's bound so one deep
        # batch cannot degrade this geometry's deposit volume forever
        if trim(smax) < k8:
            ent[1] += 1
            if ent[1] >= _K8_STALE:
                _K8_CACHE[key] = [trim(smax), 0]
        else:
            ent[1] = 0
        return out
    _K8_CACHE[key] = [trim(smax), 0]
    return _decode_finish(posr, raw0, raw1, nst, e_fin, out0, zlib_len,
                          h=h, w=w, c=c, nc_pad=nc_pad,
                          k8=_K8_CACHE[key][0], ncl=ncl,
                          interpret=interpret)


def plan_tpu(nb: int) -> int:
    """Padded lane count for an nb-byte stream (TPU walk path).

    Lane groups are bucketed on the parallel/buckets.py ladder (default
    {1, 1.5} x pow2: dead padded lanes stay < 33% of the walk/finish
    work while bounding jit recompilations across a mixed corpus; the
    density is autotunable per corpus - see buckets.autotune_density).
    """
    from ..parallel.buckets import bucket

    nc = -(-nb * 8 // S_TPU)
    return bucket(nc, unit=LPI)
