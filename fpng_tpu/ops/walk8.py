"""PK=8 packed-lane Pallas walk kernel (decoder stage 1).

specdec_tpu's walk duplicates each chunk lane across the 8 sublanes of
its column: gathers want sublane-uniform indices and record rows want
sublane-aligned stores, so 7/8ths of every vector ALU op is redundant.
This kernel packs 8 INDEPENDENT chunk lanes into each column (sublane s
= lane set s), dividing the per-token ALU work by ~8:

  * stream words ride an 18-tile stack w18[t][s, col] (word t of the
    column's set-s lane); the pos-aligned window comes from a
    select-first chain over the tiles (compares + selects, no gathers),
    valid because every element only ever reads its OWN lane's words;
  * the shared 4096-entry LUT gather runs once per set on sublane-
    broadcast indices (the composed two-level gather Mosaic supports
    needs sublane-uniform indices), so per-LANE gather cost matches the
    PK=1 kernel - gathers were never the walk bottleneck (STATUS r3
    "narrow LUT walk" measurement);
  * record rows store whole (8, lpi) tiles: row 8*j + s holds step j of
    lane set s - record tile j IS step j for all packed lanes, which
    makes the fixpoint membership test elementwise and the finalize
    output prefix a pure carry accumulation (no Kogge-Stone).

Capacity: each lane owns 8*maxit record rows of the shared row space,
so streams whose per-chunk token count exceeds 8*maxit (sub-2-bit/token
coding - only adversarial 2-pass content; photo corpora measure p99 ~65
tokens per 512-bit chunk) OVERFLOW: the kernel reports them per lane
and the driver falls back to the PK=1 kernel (specdec_tpu), which
covers the full 1-bit/token worst case (reference semantics
fpng.cpp:2209-2901 place no per-span token bound).

Chunk order: chunk c = g*(8*lpi) + s*lpi + col, so the finalize's
per-set transposed records flatten directly into the deposit's
lane-major monotone unit stream.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .specdec_tpu import (S_TPU, _WPL, _bpl_pad, _divmod_const, _lane_tiles,
                          expand_tpu)

_RT8 = _WPL + 2   # stream word tiles per group (16 words + 2 halo)
_INF = 0x7FFFFFFF
_MEMB8 = 32       # fixpoint membership window, in steps


def _make_walk8_kernel(lpi: int, maxit: int, guard: bool = True):
    """Kernel factory: 8*lpi packed lanes per instance, full in-kernel
    entry fixpoint (same protocol as specdec_tpu._make_walk_kernel: the
    sequential grid carries the previous group's converged last-lane
    exit in SMEM; remap + dup guard skip trailing all-dead groups)."""

    rows = 64 * maxit  # record rows (8 steps x 8 sets per iteration)

    def kernel(rm_ref, zl8_ref, p0_ref, w18_ref, lut_ref, efin_ref,
               posr_ref, raw0_ref, raw1_ref, nst_ref, ovf_ref, *scr):
        b = pl.program_id(0)
        g = pl.program_id(1)
        gm = rm_ref[b, g]
        carry_s = scr[-1]

        @pl.when(g == 0)
        def _():
            carry_s[0] = p0_ref[b, 0]

        def run():
            _walk8_body(gm, zl8_ref, w18_ref, lut_ref, efin_ref,
                        posr_ref, raw0_ref, raw1_ref, nst_ref, ovf_ref,
                        scr, lpi, maxit)

        if guard:
            dup = (g > 0) & (gm == rm_ref[b, jnp.maximum(g - 1, 0)])
            pl.when(~dup)(run)
        else:
            run()

    return kernel


def _walk8_body(g, zl8_ref, w18_ref, lut_ref, efin_ref, posr_ref,
                raw0_ref, raw1_ref, nst_ref, ovf_ref, scr, lpi, maxit):
    pos_s, outl_s, act_s, nst_s, ent_s, exit_s, ovf_s, carry_s = scr
    zl8 = zl8_ref[pl.program_id(0), 0]

    subl = jax.lax.broadcasted_iota(jnp.int32, (8, lpi), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, lpi), 1)
    # chunk index: c = g*(8*lpi) + s*lpi + col (set-major within group)
    lane = g * (8 * lpi) + subl * lpi + col
    lane_bit0 = lane * S_TPU
    lane_word0 = lane * _WPL
    bound = jnp.minimum(lane_bit0 + S_TPU, zl8)
    live = lane_bit0 < zl8

    tiles = [w18_ref[0, 0, t] for t in range(_RT8)]
    luts = [lut_ref[0, t].astype(jnp.int32) for t in range(4)]

    lshr = jax.lax.shift_right_logical

    def step(pos, outl, act):
        # per-lane 32-bit window: select-first over the 18 word tiles
        # (each element reads only its own lane's words; garbage
        # positions select tile 0 - equally garbage, masked downstream)
        jw = lshr(pos, 5) - lane_word0
        sel0 = tiles[0]
        sel1 = tiles[1]
        for t in range(1, _RT8):
            cmp = jw == t
            sel0 = jnp.where(cmp, tiles[t], sel0)
            if t + 1 < _RT8:
                sel1 = jnp.where(cmp, tiles[t + 1], sel1)
        sh = pos & 31
        w = lshr(sel0, sh) | ((sel1 << (31 - sh)) << 1)
        pk = w & 0xFFF

        # LUT: once per set on sublane-broadcast indices (the composed
        # 2-level gather needs sublane-uniform indices), merged back by
        # set - per-lane gather count matches the PK=1 kernel
        e = jnp.zeros((8, lpi), jnp.int32)
        for s in range(8):
            pks = jnp.broadcast_to(pk[s:s + 1], (8, lpi))
            col_ = pks & 127
            row = (pks >> 7) & 7
            tid = pks >> 10
            parts = []
            lsl = min(lpi, 128)  # lane-slice width (lpi<128: interpret)
            for k in range(lpi // lsl):
                cs = col_[:, lsl * k:lsl * (k + 1)]
                rs = row[:, lsl * k:lsl * (k + 1)]
                ts = tid[:, lsl * k:lsl * (k + 1)]
                sel = jnp.take_along_axis(luts[0], cs, axis=1)
                for t in range(1, 4):
                    m1 = jnp.take_along_axis(luts[t], cs, axis=1)
                    sel = jnp.where(ts == t, m1, sel)
                parts.append(jnp.take_along_axis(sel, rs, axis=0))
            es = jnp.concatenate(parts, axis=1)
            e = jnp.where(subl == s, es, e)

        sym = e & 511
        clen = (e >> 9) & 15
        nextra = (e >> 13) & 7
        base = (e >> 16) & 0x1FF
        is_m = (sym > 256) & (sym <= 285)
        extra = lshr(w, clen) & ((1 << nextra) - 1)
        run = base + extra
        stop = clen == 0
        l2 = (e >> 25) & 15
        s2 = (e >> 16) & 0xFF
        two = (sym < 256) & ~stop & (l2 > 0)
        tok = clen + jnp.where(is_m, nextra + 1, 0) + jnp.where(two, l2, 0)
        outlen = jnp.where(sym < 256, 1, jnp.where(is_m, run, 0)) + \
            jnp.where(two, 1, 0)

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
        ent = ent_s[...]
        act0 = wm & (ent < bound) & live
        pos_s[...] = ent
        outl_s[...] = jnp.zeros((8, lpi), jnp.int32)
        act_s[...] = act0.astype(jnp.int32)
        nst_s[...] = jnp.zeros((8, lpi), jnp.int32)

        def wr(ref, r0_, val):
            if not first:
                old = ref[0, 0, pl.ds(r0_, 8), :]
                val = jnp.where(wm, val, old)
            ref[0, 0, pl.ds(r0_, 8), :] = val

        def body(st):
            it, _any = st
            pos = pos_s[...]
            outl = outl_s[...]
            act = act_s[...] != 0
            cnt = nst_s[...]
            for u in range(8):
                cnt = cnt + act.astype(jnp.int32)
                pos, outl, act, spos, r0, r1 = step(pos, outl, act)
                r0_ = it * 64 + u * 8
                wr(posr_ref, r0_, spos)
                wr(raw0_ref, r0_, r0)
                wr(raw1_ref, r0_, r1)
            pos_s[...] = pos
            outl_s[...] = outl
            act_s[...] = act.astype(jnp.int32)
            nst_s[...] = cnt
            return it + 1, jnp.any(act).astype(jnp.int32)

        def cond(st):
            return (st[0] < maxit) & (st[1] != 0)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

        # overflow: lane still active after the row budget - the stream
        # codes below 8*maxit tokens per chunk; caller must fall back
        if first:
            exit_s[...] = pos_s[...]
            nst_ref[0, 0] = nst_s[...]
            ovf_s[...] = act_s[...]
        else:
            exit_s[...] = jnp.where(wm, pos_s[...], exit_s[...])
            nst_ref[0, 0] = jnp.where(wm, nst_s[...], nst_ref[0, 0])
            ovf_s[...] = jnp.where(wm, act_s[...], ovf_s[...])

    # pass 0: byte-aligned guesses; the group's first chunk (set 0,
    # col 0) takes the carry
    first_lane = (subl == 0) & (col == 0)
    ent_s[...] = jnp.where(first_lane,
                           jnp.broadcast_to(carry_s[0], (8, lpi)),
                           lane_bit0)
    walk(jnp.full((8, lpi), True), first=True)

    def fix_body(st):
        it, _chg = st
        # chunk c-1 of (s, col): (s, col-1), wrapping to (s-1, lpi-1)
        ex = exit_s[...]
        prev = pltpu.roll(ex, 1, 1)
        prev = jnp.where(col == 0, pltpu.roll(prev, 1, 0), prev)
        e_new = jnp.where(first_lane,
                          jnp.broadcast_to(carry_s[0], (8, lpi)), prev)
        ent = ent_s[...]
        chg = (e_new != ent) & live
        # in-VMEM membership, elementwise: record tile j is step j of
        # every packed lane
        n_old = nst_ref[0, 0]
        hit = jnp.zeros((8, lpi), jnp.int32)
        # membership window cannot read past the record rows actually
        # allocated (rows = 64*maxit, 8 rows per step j) — small maxit
        # calls (overflow probes, tests) would slice out of bounds
        for j in range(min(_MEMB8, 8 * maxit)):
            pr = posr_ref[0, 0, 8 * j:8 * (j + 1), :]
            r0r = raw0_ref[0, 0, 8 * j:8 * (j + 1), :]
            r1r = raw1_ref[0, 0, 8 * j:8 * (j + 1), :]
            h = (pr == e_new) | \
                ((r1r != 0) & (pr + ((r0r >> 19) & 15) == e_new))
            hit = hit | (h & (j < n_old)).astype(jnp.int32)
        member = hit > 0
        ent_s[...] = jnp.where(chg, e_new, ent)
        walk(chg & ~member, first=False)
        return it + 1, jnp.max(chg.astype(jnp.int32))

    def fix_cond(st):
        return (st[0] < 8 * lpi + 2) & (st[1] != 0)

    jax.lax.while_loop(fix_cond, fix_body, (jnp.int32(0), jnp.int32(1)))

    efin_ref[0, 0] = ent_s[...]
    ovf_ref[0, 0] = ovf_s[...]
    last_lane = (subl == 7) & (col == lpi - 1)
    carry_s[0] = jnp.max(jnp.where(last_lane, exit_s[...], -_INF))


@functools.partial(jax.jit, static_argnames=("ng", "lpi", "maxit",
                                             "interpret"))
def walk_fix8_tpu(w18t, lutp4, p0, zl8, remap=None, *, ng: int, lpi: int,
                  maxit: int, interpret: bool = False):
    """The complete decode walk - guess pass + entry fixpoint - in ONE
    pallas launch over PK=8 packed lanes.

    w18t: (B, NG, 18, 8, lpi) int32 per-lane stream-word tiles;
    lutp4: (B, 4, 8, 128) int32 packed LUT tiles; p0/zl8 as in
    specdec_tpu.walk_fix_tpu.  Returns (efin, posr, raw0, raw1, nst,
    ovf); records raw in (B, NG, 64*maxit, lpi) layout - row 8*j + s is
    step j of lane set s; nst/efin/ovf are (B, NG, 8, lpi) per-lane.
    """
    B = w18t.shape[0]
    guard = not interpret
    if remap is None:
        remap = jnp.broadcast_to(
            jnp.arange(ng, dtype=jnp.int32)[None, :], (B, ng))
    else:
        assert guard, "remap requires the dup guard (not interpret mode)"

    def gmap(spec):
        return lambda b, g, rm: spec(b, rm[b, g])

    rows = 64 * maxit
    rec_spec = pl.BlockSpec((1, 1, rows, lpi),
                            gmap(lambda b, g: (b, g, 0, 0)),
                            memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, 1, 8, lpi),
                             gmap(lambda b, g: (b, g, 0, 0)),
                             memory_space=pltpu.VMEM)
    out_specs = (lane_spec, rec_spec, rec_spec, rec_spec, lane_spec,
                 lane_spec)
    out_shape = (
        jax.ShapeDtypeStruct((B, ng, 8, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, rows, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, rows, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, rows, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, 8, lpi), jnp.int32),
        jax.ShapeDtypeStruct((B, ng, 8, lpi), jnp.int32),
    )
    scratch = [pltpu.VMEM((8, lpi), jnp.int32) for _ in range(7)] + \
        [pltpu.SMEM((1,), jnp.int32)]
    in_specs = [
        pl.BlockSpec((B, 1), lambda b, g, rm: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((B, 1), lambda b, g, rm: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, _RT8, 8, lpi),
                     gmap(lambda b, g: (b, g, 0, 0, 0)),
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
        _make_walk8_kernel(lpi, maxit, guard=guard),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(remap.astype(jnp.int32), zl8.astype(jnp.int32),
      p0.astype(jnp.int32).reshape(B, 1), w18t, lutp4)


def _prep_w18_tiles(stream, nc_pad: int, lpi: int):
    """(B, Nb) uint8 -> (B, NG, 18, 8, lpi) int32 per-lane word tiles
    in chunk order c = g*(8*lpi) + s*lpi + col."""
    B = stream.shape[0]
    tiles = _lane_tiles(stream, nc_pad)[:, :, :_RT8]   # (B, NC, 18)
    ng = nc_pad // (8 * lpi)
    t5 = tiles.reshape(B, ng, 8, lpi, _RT8)
    return jnp.transpose(t5, (0, 1, 4, 2, 3)), ng


@functools.partial(
    jax.jit, static_argnames=("nc_pad", "lpi", "maxit", "ncg_live",
                              "interpret"))
def _decode_walk8(stream, lutp, p0, zlib_len, *, nc_pad: int, lpi: int,
                  maxit: int, ncg_live: int | None = None,
                  interpret: bool = False):
    """Stage 1 (walk8): returns (posr, raw0, raw1, nst, e_fin, out0,
    steps, ovf) - records raw in walk8 layout; steps is the per-batch
    live-step trim bound (step units); ovf flags capacity overflow
    (any lane needing > 8*maxit steps - caller falls back to PK=1)."""
    B = stream.shape[0]
    NC = nc_pad
    zl8 = (zlib_len * 8).reshape(B, 1)
    lutp4 = lutp.astype(jnp.uint32).reshape(B, 4, 8, 128).astype(jnp.int32)

    starts = (jnp.arange(NC, dtype=jnp.int32) * S_TPU)[None, :]
    dead = starts >= zl8

    w18t, ngr = _prep_w18_tiles(stream, NC, lpi)

    remap0 = None
    if not interpret and ncg_live is not None and ncg_live < ngr:
        r0 = np.concatenate([
            np.arange(ncg_live, dtype=np.int32),
            np.full(ngr - ncg_live, ncg_live - 1, np.int32)])
        remap0 = jnp.broadcast_to(r0[None, :], (B, ngr))
    e_fin4, posr, raw0, raw1, nst4, ovf4 = walk_fix8_tpu(
        w18t, lutp4, p0, zl8, remap=remap0, ng=ngr, lpi=lpi, maxit=maxit,
        interpret=interpret)
    # per-lane views: (B, NG, ST, 8, lpi) with ST = 8*maxit steps
    ST = 8 * maxit
    posr5 = posr.reshape(B, ngr, ST, 8, lpi)
    raw05 = raw0.reshape(B, ngr, ST, 8, lpi)
    raw15 = raw1.reshape(B, ngr, ST, 8, lpi)
    e_fin = e_fin4.reshape(B, NC)
    nst = nst4.reshape(B, ngr, 1, 8, lpi)
    stepi = jnp.arange(ST, dtype=jnp.int32).reshape(1, 1, ST, 1, 1)

    nv = e_fin4.reshape(B, ngr, 1, 8, lpi)
    live = (~dead).reshape(B, ngr, 1, 8, lpi)
    recb = ((raw05 >> 9) & 1) * live * (stepi < nst)
    validr = (recb * (posr5 >= nv)).astype(jnp.int32)
    dem = (recb * (raw15 != 0) * (posr5 < nv) *
           (posr5 + ((raw05 >> 19) & 15) == nv)).astype(jnp.int32)
    outl_f = (raw05 >> 10) & 511
    outb = jnp.sum(validr * outl_f + dem * (outl_f - 1),
                   axis=2).reshape(B, NC)
    outb = jnp.where(dead, 0, outb)
    out0 = jnp.cumsum(outb, axis=1) - outb
    steps = jnp.max((validr | dem) * (stepi + 1), axis=(2, 3, 4))
    ovf = jnp.any((ovf4 != 0).reshape(B, ngr, 1, 8, lpi) & live)
    # single fused diagnostic readback (ovf | max steps): the driver
    # syncs device->host ONCE per decode, overlapped with the finish
    # dispatch - a second readback costs a full tunnel round-trip
    diag = jnp.maximum(jnp.max(steps), 0) | \
        jnp.where(ovf, jnp.int32(1 << 30), 0)
    return posr, raw0, raw1, nst4, e_fin, out0, diag


def _make_finalize8_kernel(k8: int, lsf: int, geom, gchunk: int,
                           wide: bool = False):
    """walk8 raw records -> finalized deposit records + checks.

    Same record semantics as specdec_tpu._make_finalize_kernel
    (fpng.cpp:2257-2584 constraint checks; meta/metb packing), but the
    walk8 layout makes every step tile hold ALL packed lanes, so the
    per-lane output-offset prefix is a pure carry accumulation and the
    transposed output is emitted per set."""
    row_stride, total, cch, bpl_pad = geom
    bpl = row_stride - 1
    hbplp = (total // row_stride) * bpl_pad

    def body(gc, posr_ref, raw0_ref, raw1_ref, ent_ref, out0_ref,
             nst_ref, meta_ref, metb_ref):
        e_l = ent_ref[0, gc]                       # (8, lsf)
        o0 = out0_ref[0, gc]
        n_l = nst_ref[0, gc]

        meta_tiles = []
        metb_tiles = []
        carry = o0
        fail = jnp.zeros((8, lsf), bool)
        eobm = jnp.full((8, lsf), _INF, jnp.int32)
        badm = jnp.full((8, lsf), _INF, jnp.int32)
        for j in range(k8):
            p = posr_ref[0, gc, 8 * j:8 * (j + 1), :]
            r0 = raw0_ref[0, gc, 8 * j:8 * (j + 1), :]
            r1 = raw1_ref[0, gc, 8 * j:8 * (j + 1), :]
            recbit = (((r0 >> 9) & 1) == 1) & (j < n_l)
            sym = r0 & 511
            outlen = (r0 >> 10) & 511
            clen = (r0 >> 19) & 15
            is_m = ((r0 >> 23) & 1) == 1
            s2 = r1 & 0xFF
            dem = recbit & (r1 != 0) & (p < e_l) & (p + clen == e_l)
            rec = (recbit & (p >= e_l)) | dem
            sym = jnp.where(dem, s2, sym)
            outlen = jnp.where(dem, 1, outlen)
            two = rec & (r1 != 0) & ~dem

            ol = jnp.where(rec, outlen, 0)
            outp = carry
            carry = carry + ol

            q, rowpos = _divmod_const(outp, row_stride)
            lit = rec & (sym < 256) & (rowpos != 0)
            didx = jnp.clip(q * bpl_pad + rowpos - 1, 0, hbplp)
            rowpos2 = rowpos + 1
            rowpos2 = jnp.where(rowpos2 == row_stride, 0, rowpos2)
            lit2 = two & (rowpos2 != 0)
            lit2_only = lit2 & ~lit
            didx2 = jnp.clip(q * bpl_pad + rowpos2 - 1, 0, hbplp)
            prim = lit | lit2_only
            v1 = jnp.where(lit, sym, s2)
            off = jnp.where(lit2_only, didx2, didx)
            if wide:  # bare slot + value plane (see specdec_tpu)
                meta_tiles.append(off)
                metb_tiles.append(
                    jnp.where(prim, v1 | 0x100, 0) |
                    jnp.where(lit & lit2, (s2 | 0x100) << 16, 0))
            else:
                meta_tiles.append(
                    off | jnp.where(prim, (v1 | 0x100) << 23, 0))
                metb_tiles.append(jnp.where(lit & lit2, s2 | 0x100, 0))

            lv = rec & (outp < total)
            x = rowpos - 1
            f = lv & (sym > 285)
            at_filter = lv & (rowpos == 0)
            fexp = jnp.where(outp >= row_stride, 2, 0)
            f |= at_filter & ((sym >= 256) | (sym != fexp))
            run = outlen
            _, xc = _divmod_const(x, cch)
            _, rc = _divmod_const(run, cch)
            mok = (rowpos >= 1) & (xc == 0) & (rc == 0) & (x + run <= bpl)
            f |= (lv & is_m) & ~mok
            misal = lv & (rowpos >= 1) & (xc != 0)
            f |= misal & (sym >= 256)
            f |= lv & (sym == 256)
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

        # transposed per-set output: out[s][col][j] - chunk order
        # (s, col) matches the deposit's flat monotone unit stream
        for s in range(8):
            ms = jnp.concatenate([t[s:s + 1] for t in meta_tiles], axis=0)
            bs = jnp.concatenate([t[s:s + 1] for t in metb_tiles], axis=0)
            meta_ref[0, 0, gc, s, 0] = jnp.swapaxes(ms, 0, 1)
            metb_ref[0, 0, gc, s, 0] = jnp.swapaxes(bs, 0, 1)
        return fail, eobm, badm

    def kernel(posr_ref, raw0_ref, raw1_ref, ent_ref, out0_ref, nst_ref,
               meta_ref, metb_ref, chk_ref):
        failc = jnp.int32(0)
        eobc = jnp.full((8, lsf), _INF, jnp.int32)
        badc = jnp.full((8, lsf), _INF, jnp.int32)
        for gc in range(gchunk):
            fail, eobm, badm = body(gc, posr_ref, raw0_ref, raw1_ref,
                                    ent_ref, out0_ref, nst_ref,
                                    meta_ref, metb_ref)
            failc = jnp.maximum(failc, jnp.max(fail.astype(jnp.int32)))
            eobc = jnp.minimum(eobc, eobm)
            badc = jnp.minimum(badc, badm)

        l128 = jax.lax.broadcasted_iota(jnp.int32, (8, lsf), 1)
        chkv = jnp.where(
            l128 == 0, failc,
            jnp.where(l128 == 1, jnp.min(eobc),
                      jnp.where(l128 == 2, jnp.min(badc), 0)))
        chk_ref[0, 0, :, :] = chkv

    return kernel


_LSF8 = 128


def _finalize_records8(posr, raw0, raw1, nst4, e_fin, out0, *, k8: int,
                       geom, lpi: int, ncg: int | None = None,
                       interpret: bool = False, lsf: int | None = None,
                       wide: bool = False):
    """walk8 (B, NG, 64*maxit, lpi) raw records -> (meta, metb, chk).

    k8 is the live-step trim (step units); both the step trim and the
    live-group trim are zero-copy via the block index maps.  The
    transposed output flattens to the deposit's (B, N) lane-major
    monotone unit stream: (g, s, ls, col, j)."""
    B, ng_full, rows, lpi_ = posr.shape
    assert lpi_ == lpi
    ng = ng_full if ncg is None else ncg
    lsf = min(lpi, _LSF8) if lsf is None else lsf
    nls = lpi // lsf
    NC = ng_full * 8 * lpi
    # reshape record rows (8*j + s) -> (steps, 8, lpi) -> lane slices:
    # blocks carve (k8 steps) x (8 sets) x (_LSF8 cols); the index maps
    # only ever visit steps < k8 of groups < ncg
    # VMEM budget: 5 streamed blocks of (gchunk * 8*k8) rows x 128 lanes
    # must stay well under 16MB scoped vmem (~1280 rows, as in the PK=1
    # finalize)
    gchunk = 1 if interpret else max(1, 1280 // max(8 * k8, 1))
    while ng % gchunk:
        gchunk -= 1
    ngc = ng // gchunk
    rec_spec = pl.BlockSpec((1, gchunk, 8 * k8, lsf),
                            lambda b, g, ls: (b, g, 0, ls),
                            memory_space=pltpu.VMEM)
    rec_t_spec = pl.BlockSpec((1, 1, gchunk, 8, 1, lsf, k8),
                              lambda b, g, ls: (b, g, 0, 0, ls, 0, 0),
                              memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, gchunk, 8, lsf),
                             lambda b, g, ls: (b, g, 0, ls),
                             memory_space=pltpu.VMEM)
    e4 = e_fin.reshape(B, ng_full, 8, lpi)
    o4 = out0.reshape(B, ng_full, 8, lpi)
    meta, metb, chk = pl.pallas_call(
        _make_finalize8_kernel(k8, lsf, geom, gchunk, wide=wide),
        grid=(B, ngc, nls),
        in_specs=[rec_spec, rec_spec, rec_spec, lane_spec, lane_spec,
                  lane_spec],
        out_specs=(
            rec_t_spec, rec_t_spec,
            pl.BlockSpec((1, 1, 8, lsf),
                         lambda b, g, ls: (b, g * nls + ls, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, ngc, gchunk, 8, nls, lsf, k8),
                                 jnp.int32),
            jax.ShapeDtypeStruct((B, ngc, gchunk, 8, nls, lsf, k8),
                                 jnp.int32),
            jax.ShapeDtypeStruct((B, ngc * nls, 8, lsf), jnp.int32),
        ),
        interpret=interpret,
    )(posr, raw0, raw1, e4, o4, nst4)
    return meta, metb, chk[:, :, 0, :3]


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "c", "nc_pad", "lpi", "ncl", "k8",
                     "interpret"))
def _decode_finish8(posr, raw0, raw1, nst4, e_fin, out0, zlib_len, *,
                    h: int, w: int, c: int, nc_pad: int, lpi: int,
                    k8: int, ncl: int | None = None,
                    interpret: bool = False):
    """Stage 2 (walk8): finalize + deposit + expansion.  Mirrors
    specdec_tpu._decode_finish for the walk8 record layout."""
    B = posr.shape[0]
    NC = nc_pad if ncl is None else ncl
    row_stride = 1 + w * c
    total = h * row_stride

    from .bitpack import is_tpu_backend as _is_tpu
    from .bitpack import scatter_packed16_tpu

    wide = h * _bpl_pad(w * c) >= (1 << 23)
    meta7, metb7, chk = _finalize_records8(
        posr, raw0, raw1, nst4, e_fin, out0, k8=k8,
        geom=(row_stride, total, c, _bpl_pad(w * c)), lpi=lpi,
        ncg=NC // (8 * lpi),
        interpret=interpret or not _is_tpu(), wide=wide)

    fail_g = chk[:, :, 0]
    eob_end = jnp.min(chk[:, :, 1], axis=1)
    bad_end = jnp.min(chk[:, :, 2], axis=1)
    ok = ~jnp.any(fail_g != 0, axis=1)
    ok &= eob_end != _INF
    ok &= eob_end <= bad_end
    ok &= ((eob_end + 7) >> 3) == (zlib_len - 4)

    n_rec = NC * k8
    bpl_pad = _bpl_pad(w * c)
    H8 = -(-h // 8) * 8
    dep_words = H8 * (bpl_pad // 2)
    dep = scatter_packed16_tpu(meta7.reshape(B, n_rec), dep_words,
                               metb=metb7.reshape(B, n_rec),
                               interpret=interpret, wide=wide)
    imgs = expand_tpu(jax.lax.bitcast_convert_type(dep, jnp.int32),
                      h=h, w=w, c=c, bpl_pad=bpl_pad,
                      interpret=interpret)
    return imgs, ok


_K8_CACHE8: dict = {}
_K8_STALE8 = 8
MAXIT = int(_os.environ.get("FPNG_TPU_WALK8_MAXIT", "12"))


def decode_kernel8_tpu(stream, lutp, p0, zlib_len, *, h: int, w: int,
                       c: int, nc_pad: int, lpi: int,
                       zlib_len_max: int | None = None,
                       maxit: int = MAXIT,
                       interpret: bool = False):
    """walk8 decode; same contract as specdec_tpu.decode_kernel_tpu but
    returns None on capacity overflow (caller falls back to PK=1).

    nc_pad must be a multiple of 8*lpi (plan_tpu8)."""
    import numpy as _np

    assert h * _bpl_pad(w * c) < (1 << 27), \
        "raster too large for the walk path (route via the XLA kernel)"
    assert nc_pad % (8 * lpi) == 0
    zmax = zlib_len_max if zlib_len_max is not None \
        else int(_np.asarray(zlib_len).max())
    nc_live = max(int(-(-zmax * 8 // S_TPU)), 1)
    unit = 8 * lpi
    ncl = min(-(-nc_live // unit) * unit, nc_pad)
    posr, raw0, raw1, nst4, e_fin, out0, diag = _decode_walk8(
        stream, lutp, p0, zlib_len, nc_pad=nc_pad, lpi=lpi, maxit=maxit,
        ncg_live=ncl // unit, interpret=interpret)
    try:
        diag.copy_to_host_async()
    except AttributeError:
        pass

    ST = 8 * maxit

    def trim(smax):
        return min(-(-max(smax, 8) // 16) * 16 if smax > 8 else 8, ST)

    key = (h, w, c, nc_pad, lpi)
    ent = _K8_CACHE8.get(key)
    if ent is None:
        d = int(_np.asarray(diag))
        if d & (1 << 30):
            return None
        k8 = trim(d)
        _K8_CACHE8[key] = [k8, 0]
        return _decode_finish8(posr, raw0, raw1, nst4, e_fin, out0,
                               zlib_len, h=h, w=w, c=c, nc_pad=nc_pad,
                               lpi=lpi, k8=k8, ncl=ncl,
                               interpret=interpret)
    k8 = ent[0]
    out = _decode_finish8(posr, raw0, raw1, nst4, e_fin, out0, zlib_len,
                          h=h, w=w, c=c, nc_pad=nc_pad, lpi=lpi, k8=k8,
                          ncl=ncl, interpret=interpret)
    d = int(_np.asarray(diag))  # overlaps the finish dispatch
    if d & (1 << 30):
        return None
    smax = d
    if smax <= k8:
        if trim(smax) < k8:
            ent[1] += 1
            if ent[1] >= _K8_STALE8:
                _K8_CACHE8[key] = [trim(smax), 0]
        else:
            ent[1] = 0
        return out
    _K8_CACHE8[key] = [trim(smax), 0]
    return _decode_finish8(posr, raw0, raw1, nst4, e_fin, out0, zlib_len,
                           h=h, w=w, c=c, nc_pad=nc_pad, lpi=lpi,
                           k8=_K8_CACHE8[key][0], ncl=ncl,
                           interpret=interpret)


def plan_tpu8(nb: int, lpi: int | None = None):
    """(nc_pad, lpi) for an nb-byte stream on the walk8 path.

    lpi sets the padding granule (8*lpi chunks): small streams take
    lpi=128 (1024-chunk granule) to bound dead-lane waste; larger ones
    lpi=256/512 for wider vector tiles."""
    from ..parallel.buckets import bucket

    nc = -(-nb * 8 // S_TPU)
    if lpi is None:
        lpi = 128 if nc <= 4096 else (256 if nc <= 16384 else 512)
    return bucket(nc, unit=8 * lpi), lpi
