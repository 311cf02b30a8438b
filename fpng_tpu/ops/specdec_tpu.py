"""Pallas TPU walk kernel for the chunked speculative decoder.

The XLA formulation of the lockstep walk (ops/specdec.py) spends ~all its
time in per-step gathers, which XLA:TPU runs at ~100 Melem/s.  This kernel
keeps every per-token lookup inside VMEM using the two vector-gather forms
Mosaic supports on (8, 128) tiles:

  * per-lane chunk bytes ride in columns of a (72, 1024) tile, so a
    sublane-dim take_along_axis reads each lane's 24-bit window directly
    (lanes' streams are private per column);
  * the shared 4096-entry packed LUT is 4 (8, 128) tiles; a lane-dim
    gather (column select) composed with a sublane-dim gather (row select)
    resolves a full 12-bit lookup per 128-lane slice.

One kernel instance walks 1024 chunk lanes of one image (grid (B, NG)),
S = 512-bit chunks, with 8 steps unrolled per loop iteration so record
rows store at sublane-aligned offsets and the ~1.3us/iteration loop tax
amortizes.  Each step consumes up to TWO tokens via the LUT's
speculatively packed second literal (the reference decoder's own trick,
fpng.cpp:2080-2102, see pack_lut) - fewer walk steps AND fewer record
slots.  The entry fixpoint stays in XLA (pass0 + incremental re-walks);
the RECORD pass receives the fixpoint's global per-lane output offsets
and finalizes everything in-kernel:

  meta = (0x100 | sym) << 23 | data_offset23   primary data literal
         clamped monotone data offset          otherwise
  metb = (0x100 | sym2)                        paired second literal

(data offsets exclude filter-byte slots and pad each row to bpl_pad;
a step's two literals are output-adjacent, so metb rides the same
32-bit deposit unit's high half), plus the reference's per-record
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
LPI = int(_os.environ.get("FPNG_TPU_LPI_REC", "1024"))  # record-pass lanes
ST8 = S_TPU + 24     # record rows (8-aligned; covers 1-bit/token worst case)
_TILES = 9           # ceil((S/8 + 4) / 8) 8-row stream tiles per lane
_RT = _TILES * 8     # stream tile rows (72)


def _make_walk_kernel(lpi: int, with_records: bool, geom=None):
    """Kernel factory: lpi lanes per instance; records optional (the
    fixpoint passes only need exits/outbytes).

    geom = (row_stride, total, c) makes the record pass emit FINALIZED
    records - packed deposit units with global output offsets - and run
    the reference's per-record constraint checks in-kernel, reducing to
    per-group (fail, eob_end, bad_end) scalars.  This removes the
    O(records) XLA reconstruction the finish stage used to do (cumsums,
    fail logic, transposed decode of sym/clen/run)."""

    def kernel(zl8_ref, w24_ref, lut_ref, ent_ref, *rest):
        if with_records:
            out0_ref = rest[0]
            (exit_ref, outb_ref, steps_ref, meta_ref, metb_ref,
             chk_ref) = rest[1:7]
            scr = rest[7:]
        else:
            out0_ref = chk_ref = None
            exit_ref, outb_ref = rest[:2]
            steps_ref = meta_ref = metb_ref = None
            scr = rest[2:]
        _walk_body(zl8_ref, w24_ref, lut_ref, ent_ref, out0_ref, exit_ref,
                   outb_ref, steps_ref, meta_ref, metb_ref, chk_ref,
                   scr, lpi, with_records, geom)

    return kernel


_INF = 0x7FFFFFFF


def _walk_body(zl8_ref, w24_ref, lut_ref, ent_ref, out0_ref,
               exit_ref, outb_ref, steps_ref, meta_ref, metb_ref, chk_ref,
               scr, LPI, with_records, geom):
    if with_records:
        pos_s, outl_s, act_s, fail_s, eob_s, bad_s = scr
    else:
        pos_s, outl_s, act_s = scr
    g = pl.program_id(1)
    zl8 = zl8_ref[pl.program_id(0), 0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LPI), 1) + g * LPI
    lane_bit0 = lane * S_TPU
    lane_byte0 = lane_bit0 >> 3
    bound = jnp.minimum(lane_bit0 + S_TPU, zl8)

    ent = jnp.broadcast_to(ent_ref[0, 0], (8, LPI)).astype(jnp.int32)
    if with_records:
        out0 = jnp.broadcast_to(out0_ref[0, 0], (8, LPI)).astype(jnp.int32)
        row_stride, total, cch, bpl_pad = geom
        bpl = row_stride - 1
        # data raster rows padded to bpl_pad so the expansion kernel's
        # blocks tile cleanly (pad slots receive no records)
        hbplp = (total // row_stride) * bpl_pad

    tiles = [w24_ref[0, 0, 8 * t:8 * (t + 1), :] for t in range(_TILES)]
    luts = [lut_ref[0, t].astype(jnp.int32) for t in range(4)]
    subl = jax.lax.broadcasted_iota(jnp.int32, (8, LPI), 0)

    def step(pos, outl, act, fail, eobm, badm):
        j = (pos >> 3) - lane_byte0
        w = jnp.zeros((8, LPI), jnp.int32)
        for t in range(_TILES):
            jt = jnp.clip(j - 8 * t, 0, 7)
            cand = jnp.take_along_axis(tiles[t], jt, axis=0)
            w = jnp.where((j >= 8 * t) & (j < 8 * (t + 1)), cand, w)
        sh = pos & 7
        pk = (w >> sh) & 0xFFF

        col = pk & 127
        row = (pk >> 7) & 7
        tid = pk >> 10
        parts = []
        for k in range(LPI // 128):
            cs = col[:, 128 * k:128 * (k + 1)]
            rs = row[:, 128 * k:128 * (k + 1)]
            ts = tid[:, 128 * k:128 * (k + 1)]
            acc = jnp.zeros((8, 128), jnp.int32)
            for t in range(4):
                m1 = jnp.take_along_axis(luts[t], cs, axis=1)
                m2 = jnp.take_along_axis(m1, rs, axis=0)
                acc = jnp.where(ts == t, m2, acc)
            parts.append(acc)
        e = jnp.concatenate(parts, axis=1)

        sym = e & 511
        clen = (e >> 9) & 15
        nextra = (e >> 13) & 7
        base = (e >> 16) & 0x1FF
        is_m = (sym > 256) & (sym <= 285)
        extra = (w >> (sh + clen)) & ((1 << nextra) - 1)
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

        if with_records:
            # finalized record: (0x100 | sym) << 23 for data literals
            # (the deposit value, flag bit included) packed over the
            # clamped DATA-SPACE offset - output position minus the
            # filter-byte slots before it - so the deposit directly
            # produces the (h, w*c) delta raster and the expansion stage
            # needs no strided filter-slot stripping.  Non-literal,
            # filter-byte and inactive slots keep the bare (monotone)
            # offset.  total < 2^23 guaranteed by the driver.
            rec = act & ~stop
            outp = out0 + outl
            q = outp // row_stride
            rowpos = outp - q * row_stride
            lit = rec & (sym < 256) & (rowpos != 0)
            didx = jnp.clip(q * bpl_pad + rowpos - 1, 0, hbplp)

            # second-symbol record: when both are data literals they are
            # output-adjacent, so s2 rides the SAME deposit unit's high
            # half (metaB); when the FIRST symbol is a filter byte, s2
            # becomes the primary record at its own slot instead (the
            # hi-half trick would need slot didx-1, which clips at row 0)
            rec2 = rec & two
            rowpos2 = rowpos + 1
            rowpos2 = jnp.where(rowpos2 == row_stride, 0, rowpos2)
            lit2 = rec2 & (rowpos2 != 0)
            lit2_only = lit2 & ~lit
            didx2 = jnp.clip(q * bpl_pad + rowpos2 - 1, 0, hbplp)
            prim = lit | lit2_only
            v1 = jnp.where(lit, sym, s2)
            off = jnp.where(lit2_only, didx2, didx)
            meta = off | jnp.where(prim, (v1 | 0x100) << 23, 0)
            metb = jnp.where(lit & lit2, s2 | 0x100, 0)

            # reference constraint checks (fpng.cpp:2257-2584 semantics),
            # accumulated as vectors and reduced once at kernel end
            live = rec & (outp < total)
            x = rowpos - 1
            f = live & (sym > 285)
            at_filter = live & (rowpos == 0)
            fexp = jnp.where(outp >= row_stride, 2, 0)
            f |= at_filter & ((sym >= 256) | (sym != fexp))
            mt = live & is_m
            xc = x - (x // cch) * cch
            rc = run - (run // cch) * cch
            mok = (rowpos >= 1) & (xc == 0) & (rc == 0) & (x + run <= bpl)
            f |= mt & ~mok
            misal = live & (rowpos >= 1) & (xc != 0)
            f |= misal & (sym >= 256)
            f |= live & (sym == 256)
            at_total = rec & (outp == total)
            at_eob = at_total & (sym == 256)
            fail = fail | f
            eobm = jnp.minimum(eobm, jnp.where(at_eob, pos + clen, _INF))
            badm = jnp.minimum(
                badm, jnp.where(at_total & (sym != 256), pos, _INF))

            # checks for the second literal (never a match/EOB): filter
            # placement, and a literal landing exactly at the stream end
            outp2 = outp + 1
            live2 = rec2 & (outp2 < total)
            at_filter2 = live2 & (rowpos2 == 0)
            fexp2 = jnp.where(outp2 >= row_stride, 2, 0)
            fail = fail | (at_filter2 & (s2 != fexp2))
            at_total2 = rec2 & (outp2 == total)
            badm = jnp.minimum(
                badm, jnp.where(at_total2, pos + clen, _INF))
        else:
            meta = metb = jnp.zeros_like(pos)
        adv = act & ~stop
        pos = jnp.where(adv, pos + tok, pos)
        outl = outl + jnp.where(adv, outlen, 0)
        act = adv & (pos < bound)
        return pos, outl, act, meta, metb, fail, eobm, badm

    act0 = (ent < bound) & (lane_bit0 < zl8)

    # Mosaic only legalizes while loops with SCALAR carries: vector state
    # lives in scratch refs, the loop carries (iteration, any-active);
    # record passes carry three extra check-accumulator tiles
    pos_s[...] = ent
    outl_s[...] = jnp.zeros((8, LPI), jnp.int32)
    act_s[...] = act0.astype(jnp.int32)
    if with_records:
        fail_s[...] = jnp.zeros((8, LPI), jnp.int32)
        eob_s[...] = jnp.full((8, LPI), _INF, jnp.int32)
        bad_s[...] = jnp.full((8, LPI), _INF, jnp.int32)

    def body(st):
        it, _any = st
        pos = pos_s[...]
        outl = outl_s[...]
        act = act_s[...] != 0
        if with_records:
            fail = fail_s[...] != 0
            eobm = eob_s[...]
            badm = bad_s[...]
        else:
            fail = jnp.zeros((8, LPI), bool)
            eobm = badm = jnp.zeros((8, LPI), jnp.int32)
        g_meta = jnp.zeros((8, LPI), jnp.int32)
        g_metb = jnp.zeros((8, LPI), jnp.int32)
        for u in range(8):
            pos, outl, act, meta, metb, fail, eobm, badm = \
                step(pos, outl, act, fail, eobm, badm)
            g_meta = jnp.where(subl == u, meta, g_meta)
            g_metb = jnp.where(subl == u, metb, g_metb)
        if with_records:
            meta_ref[0, 0, pl.ds(it * 8, 8), :] = g_meta[:, :]
            metb_ref[0, 0, pl.ds(it * 8, 8), :] = g_metb[:, :]
            fail_s[...] = fail.astype(jnp.int32)
            eob_s[...] = eobm
            bad_s[...] = badm
        pos_s[...] = pos
        outl_s[...] = outl
        act_s[...] = act.astype(jnp.int32)
        return it + 1, jnp.any(act).astype(jnp.int32)

    def cond(st):
        return (st[0] < ST8 // 8) & (st[1] != 0)

    it, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

    outl_f = outl_s[...]

    if with_records:
        # fill remaining record rows with the final clamped data-space
        # offsets so the deposit stream stays monotone past lane exits
        d_f = jnp.minimum(out0 + outl_f, total)
        q_f = d_f // row_stride
        m_fill = jnp.clip(q_f * bpl_pad + (d_f - q_f * row_stride) - 1,
                          0, hbplp)

        zero8 = jnp.zeros((8, LPI), jnp.int32)

        def fill_body(it2):
            meta_ref[0, 0, pl.ds(it2 * 8, 8), :] = m_fill
            metb_ref[0, 0, pl.ds(it2 * 8, 8), :] = zero8
            return it2 + 1

        jax.lax.while_loop(lambda it2: it2 < ST8 // 8, fill_body, it)
        steps_ref[pl.program_id(0), g] = it * 8
        chk_ref[pl.program_id(0), g, 0] = jnp.max(fail_s[...])
        chk_ref[pl.program_id(0), g, 1] = jnp.min(eob_s[...])
        chk_ref[pl.program_id(0), g, 2] = jnp.min(bad_s[...])

    exit_ref[0, 0, 0, :] = pos_s[0, :]
    outb_ref[0, 0, 0, :] = outl_f[0, :]


@functools.partial(jax.jit,
                   static_argnames=("ng", "lpi", "with_records", "geom",
                                    "interpret"))
def walk_pass_tpu(w24t, lutp4, entries, zl8, out0=None, *, ng: int,
                  lpi: int = LPI, with_records: bool = True, geom=None,
                  interpret: bool = False):
    """One lockstep walk pass over every chunk lane.

    w24t: (B, NG, 72, lpi) int32 per-lane 24-bit windows;
    lutp4: (B, 4, 8, 128) int32 packed LUT tiles;
    entries: (B, NG, 1, lpi) int32; zl8: (B, 1) int32 stream bit length.
    Record passes additionally take out0 (B, NG, 1, lpi) global output
    byte offsets and geom=(row_stride, total, c, bpl_pad) and return
    finalized records plus per-group check scalars (_make_walk_kernel).
    Returns (exits, outb[, steps, meta, metb, chk]); records
    (B, NG, ST8, lpi).
    """
    B = w24t.shape[0]
    out_specs = [
        pl.BlockSpec((1, 1, 1, lpi), lambda b, g: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, lpi), lambda b, g: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, ng, 1, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, 1, lpi), jnp.int32),
    ]
    scratch = [pltpu.VMEM((8, lpi), jnp.int32) for _ in range(3)]
    if with_records:
        assert geom is not None and out0 is not None
        out_specs += [
            pl.BlockSpec((B, ng), lambda b, g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ST8, lpi), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ST8, lpi), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ng, 3), lambda b, g: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, ng), jnp.int32),
            jax.ShapeDtypeStruct((B, ng, ST8, lpi), jnp.int32),
            jax.ShapeDtypeStruct((B, ng, ST8, lpi), jnp.int32),
            jax.ShapeDtypeStruct((B, ng, 3), jnp.int32),
        ]
        scratch += [pltpu.VMEM((8, lpi), jnp.int32) for _ in range(3)]
    in_specs = [
        pl.BlockSpec((B, 1), lambda b, g: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, _RT, lpi), lambda b, g: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 8, 128), lambda b, g: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, lpi), lambda b, g: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [zl8.astype(jnp.int32), w24t, lutp4, entries]
    if with_records:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, lpi), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(out0)
    kw = dict(
        grid=(B, ng),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )
    return pl.pallas_call(
        _make_walk_kernel(lpi, with_records, geom), **kw)(*args)


def _lane_tiles(stream, nc_pad: int):
    """(B, Nb) uint8 -> (B, NC, 72) int32 per-lane 24-bit windows."""
    B, nb = stream.shape
    s32 = stream.astype(jnp.int32)
    need = nc_pad * (S_TPU // 8) + 72
    pad = need - nb
    sp = jnp.pad(s32, ((0, 0), (0, max(pad, 2))))
    w24 = sp[:, :need - 2] | (sp[:, 1:need - 1] << 8) | (sp[:, 2:need] << 16)
    sb = S_TPU // 8  # 64 bytes per lane
    base = w24[:, :nc_pad * sb].reshape(B, nc_pad, sb)
    halo = w24[:, sb:nc_pad * sb + sb].reshape(B, nc_pad, sb)[:, :, :8]
    return jnp.concatenate([base, halo], axis=2)           # (B, NC, 72)


def _prep_w24_tiles(stream, nc_pad: int, lpi: int, tiles=None):
    """(B, Nb) uint8 -> (B, NG, 72, lpi) int32 per-lane window tiles."""
    B = stream.shape[0]
    if tiles is None:
        tiles = _lane_tiles(stream, nc_pad)
    ng = nc_pad // lpi
    return jnp.swapaxes(tiles.reshape(B, ng, lpi, _RT), 2, 3), ng


LPI_FIX = 4096  # lanes per instance for the record-free fixpoint passes


def _bpl_pad(bpl: int) -> int:
    """Data-raster row padding: multiples of 256 slots so the expansion
    kernel's (8, bpl_pad/2)-word blocks tile on 128 lanes.  Skinny rows
    stay unpadded (they take the XLA expansion, where padding would
    inflate the deposit's offset span instead)."""
    return bpl if bpl < 256 else -(-bpl // 256) * 256


@functools.partial(
    jax.jit, static_argnames=("nc_pad", "h", "w", "c", "interpret"))
def _decode_walk(stream, lutp, p0, zlib_len, *, nc_pad: int, h: int,
                 w: int, c: int, interpret: bool = False):
    """Stage 1: fixpoint + final recording pass.

    Returns (meta4, metb4, chk, steps, fix_passes) with records still in
    (B, NG, ST8, LPI)
    kernel layout so the host can trim step rows before the expansion
    stage.  Records arrive FINALIZED (global clamped output offset +
    packed deposit value) and pre-checked (chk = per-group
    fail/eob_end/bad_end) - the finish stage only deposits and expands.
    """
    B = stream.shape[0]
    NC = nc_pad
    zl8 = (zlib_len * 8).reshape(B, 1)
    lutp4 = lutp.astype(jnp.uint32).reshape(B, 4, 8, 128).astype(jnp.int32)

    starts = (jnp.arange(NC, dtype=jnp.int32) * S_TPU)[None, :]
    dead = starts >= zl8
    e0 = jnp.broadcast_to(starts, (B, NC)).at[:, 0].set(p0)
    BIG = jnp.int32(0x3FFFFFFF)  # >= every bound: masked lanes exit at once

    # record-free fixpoint at the widest instance size dividing NC
    lpi_f = LPI_FIX
    while NC % lpi_f:
        lpi_f //= 2
    tiles = _lane_tiles(stream, NC)
    w24f, ngf = _prep_w24_tiles(stream, NC, lpi_f, tiles)

    def fix_cond(st):
        k, _e, _x, _o, changed = st
        return changed & (k <= NC)

    # Incremental re-walks: periodic content (flat image bands) defeats
    # self-synchronization, so entry stabilization can march one chunk
    # per pass; only lanes whose entry changed are re-walked (the rest
    # exit instantly in-kernel), making wavefront passes nearly free.
    def fix_body(st):
        k, e, x, outb, _ch = st
        new_e = jnp.concatenate([p0[:, None], x[:, :-1]], axis=1)
        chg = new_e != e
        e_masked = jnp.where(chg, new_e, BIG)
        res = walk_pass_tpu(w24f, lutp4,
                            e_masked.reshape(B, ngf, 1, lpi_f), zl8,
                            ng=ngf, lpi=lpi_f, with_records=False,
                            interpret=interpret)
        x = jnp.where(chg, res[0].reshape(B, NC), x)
        x = jnp.where(dead, 0, x)
        outb = jnp.where(chg, res[1].reshape(B, NC), outb)
        outb = jnp.where(dead, 0, outb)
        return k + 1, new_e, x, outb, jnp.any(chg)

    res0 = walk_pass_tpu(w24f, lutp4, e0.reshape(B, ngf, 1, lpi_f), zl8,
                         ng=ngf, lpi=lpi_f, with_records=False,
                         interpret=interpret)
    x0 = jnp.where(dead, 0, res0[0].reshape(B, NC))
    o0_ = jnp.where(dead, 0, res0[1].reshape(B, NC))
    fix_passes, entries, _x, outb, _ = jax.lax.while_loop(
        fix_cond, fix_body,
        (jnp.int32(1), e0, x0, o0_, jnp.bool_(True)))

    # global per-lane output offsets from the FIXPOINT outbytes, so the
    # recording pass can finalize records in-kernel
    out0 = jnp.cumsum(outb, axis=1) - outb

    # final recording pass at narrow instances (record VMEM budget)
    w24r, ngr = _prep_w24_tiles(stream, NC, LPI, tiles)
    res = walk_pass_tpu(w24r, lutp4, entries.reshape(B, ngr, 1, LPI), zl8,
                        out0.reshape(B, ngr, 1, LPI), ng=ngr, lpi=LPI,
                        with_records=True,
                        geom=(1 + w * c, h * (1 + w * c), c,
                              _bpl_pad(w * c)),
                        interpret=interpret)
    return res[3], res[4], res[5], res[2], fix_passes


def _make_expand_kernel(P: int, c: int, w: int, wrows: int):
    """Fill + defilter over the deposited 16-bit-slot data raster.

    Input block: (1, 8, P) int32 words = 8 image rows of bpl_pad slots
    (slot = sym | lit<<8; two slots per word).  Per block: match
    forward-fill along each row (log-distance scan at slot stride c,
    split over the lo/hi word halves), then defilter (add the previous
    row mod 256, carried across blocks in scratch), then byte-pack via
    stride-2 lane gathers so the output's first ceil(bpl/4) words per
    row are the finished bytes - the XLA tail is pure prefix slices.
    """

    def kernel(dep_ref, out_ref, carry_lo, carry_hi):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            carry_lo[...] = jnp.zeros_like(carry_lo)
            carry_hi[...] = jnp.zeros_like(carry_hi)

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, P), 1)
        wv = dep_ref[0]
        v_lo = wv & 0xFF
        h_lo = (wv >> 8) & 1
        v_hi = (wv >> 16) & 0xFF
        h_hi = (wv >> 24) & 1

        def pull(v, hs, d):
            pv = pltpu.roll(v, d, 1)
            ph = jnp.where(lane >= d, pltpu.roll(hs, d, 1), 0)
            return pv, ph

        def fstep(v, hs, pv, ph):
            return (jnp.where(hs == 1, v, jnp.where(ph == 1, pv, v)),
                    hs | ph)

        d = c  # slot distance
        if c == 3:
            # odd first step crosses halves: even slot 2j pulls odd slot
            # 2j-3 (hi, lane j-2); odd slot 2j+1 pulls even 2j-2 (lo,
            # lane j-1)
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
        prev_lo = carry_lo[0:1, :]
        prev_hi = carry_hi[0:1, :]
        rows_lo = []
        rows_hi = []
        for r in range(8):
            prev_lo = (v_lo[r:r + 1, :] + prev_lo) & 0xFF
            prev_hi = (v_hi[r:r + 1, :] + prev_hi) & 0xFF
            rows_lo.append(prev_lo)
            rows_hi.append(prev_hi)
        carry_lo[0:1, :] = prev_lo
        carry_hi[0:1, :] = prev_hi
        d_lo = jnp.concatenate(rows_lo, axis=0)
        d_hi = jnp.concatenate(rows_hi, axis=0)

        # keep the 16-bit-slot layout (byte compaction needs cross-vreg
        # lane gathers Mosaic doesn't lower); the caller extracts the
        # even bytes in one XLA pass
        out_ref[0] = d_lo | (d_hi << 16)

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
    out = pl.pallas_call(
        _make_expand_kernel(P, c, w, wrows),
        grid=(B, H8 // 8),
        in_specs=[pl.BlockSpec((1, 8, P), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, P), lambda b, t: (b, t, 0),
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
    jax.jit, static_argnames=("h", "w", "c", "nc_pad", "k8", "interpret"))
def _decode_finish(meta4, metb4, chk, zlib_len, *, h: int, w: int, c: int,
                   nc_pad: int, k8: int, interpret: bool = False):
    """Stage 2: deposit + reconstruction (checks already ran in-kernel)."""
    B = meta4.shape[0]
    NC = nc_pad
    row_stride = 1 + w * c
    total = h * row_stride

    fail_g = chk[:, :, 0]
    eob_end = jnp.min(chk[:, :, 1], axis=1)
    bad_end = jnp.min(chk[:, :, 2], axis=1)
    ok = ~jnp.any(fail_g != 0, axis=1)
    ok &= eob_end != _INF
    ok &= eob_end <= bad_end
    ok &= ((eob_end + 7) >> 3) == (zlib_len - 4)

    # records arrive finalized: (0x100|sym) << 23 | clamped DATA-SPACE
    # offset (filter-byte slots excluded, rows padded to bpl_pad) for
    # data literals, bare offset otherwise (walks that stopped early
    # leave bytes unproduced; the EOB/coverage checks reject those
    # streams).  The deposit output is the contiguous padded delta
    # raster - no strided filter-slot stripping anywhere.
    meta = jnp.swapaxes(meta4[:, :, :k8, :], 2, 3).reshape(B, NC, k8)
    metb = jnp.swapaxes(metb4[:, :, :k8, :], 2, 3).reshape(B, NC, k8)
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
                                   interpret=interpret)
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
                      nc_pad: int, interpret: bool = False):
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

    # the packed record offset field is 23 bits over the padded raster
    assert h * _bpl_pad(w * c) < (1 << 23), \
        "raster too large for the walk path (route via the XLA kernel)"
    meta4, metb4, chk, steps, _fp = _decode_walk(
        stream, lutp, p0, zlib_len, nc_pad=nc_pad, h=h, w=w, c=c,
        interpret=interpret)

    def trim(smax):
        # 32-step granularity (vs pow2): up to 1.6x fewer dead record
        # slots through the finish, at a bounded recompile count
        return min(-(-max(smax, 8) // 32) * 32 if smax > 8 else 8, ST8)

    key = (h, w, c, nc_pad)
    ent = _K8_CACHE.get(key)
    if ent is None:
        k8 = trim(int(_np.asarray(steps).max()))
        _K8_CACHE[key] = [k8, 0]
        return _decode_finish(meta4, metb4, chk, zlib_len, h=h, w=w,
                              c=c, nc_pad=nc_pad, k8=k8,
                              interpret=interpret)
    k8 = ent[0]
    out = _decode_finish(meta4, metb4, chk, zlib_len, h=h, w=w, c=c,
                         nc_pad=nc_pad, k8=k8, interpret=interpret)
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
    return _decode_finish(meta4, metb4, chk, zlib_len, h=h, w=w, c=c,
                          nc_pad=nc_pad, k8=_K8_CACHE[key][0],
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
