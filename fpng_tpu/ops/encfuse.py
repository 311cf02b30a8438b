"""Fused encoder deposit: desc -> (table lookup, bit offsets, deposit).

Round 1 materialized three O(N) intermediates between kernels: one-hot MXU
code lookups (ops/lookup.py), the global bit-offset prefix sum, and the
(vals, nbits, offsets) unit arrays — together ~100x the pixel bytes in HBM
traffic.  This kernel takes one packed per-unit descriptor stream plus the
per-image 288-entry code table and does everything in VMEM:

  desc bits:  0-8  sym        table index (literal byte / len sym / 0|2
                              filter / 256 EOB)
              9    use_table  0 => raw unit (header pending-tail bits)
              10-12 extra_n   trailing bit count (len-extra + 1-bit dist
                              code for matches; pending nacc for raw)
              13-25 extra_val trailing bit value
              26   tok_start  reference flush-rule token starts

Per (8,128) sub-tile: a 3-row-select + lane-gather resolves code|size<<16
from the table tile (Mosaic's take_along_axis gather form; rows selected
by where() since sublanes here hold *distinct* units, unlike the decode
walk kernel's replicated sublanes); unit bit offsets come from a lane-dim
lower-triangular MXU cumsum plus an 8x8 row-prefix matmul plus a scalar
carry in SMEM (the grid is sequential per image, so the carry replaces the
global prefix sum); the deposit reuses the windowed one-hot-matmul store
(ops/bitpack._window_deposit).  total_bits and the last token start (the
stored-block fallback rule, fpng.cpp:1744) ride along as SMEM scalars.

Equivalent scalar semantics: the reference's one-pass emit loop
(fpng.cpp:1163-1265), restated as a batched data-parallel program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitpack import _SUB, _U, _flat_idx, _window_deposit

DESC_SYM_BITS = 9
DESC_USE_TABLE = 1 << 9
DESC_EXTRA_N_SHIFT = 10
DESC_EXTRA_VAL_SHIFT = 13
DESC_TOK_START = 1 << 26


import os as _os

# encoder deposit geometry: 2048-unit walks over 2560-word windows
# measured fastest on hardware (r4 A/B: fuse 16.7 -> 15.2ms vs
# 1024/1024; the earlier 2048/2048 regression was window overflow at
# literal-heavy spans - 64-bit quad units need >2048 words of room)
_WLE = int(_os.environ.get("FPNG_TPU_WLE", "2560"))  # encoder window words
_WRE = _WLE // 128
_GUE = int(_os.environ.get("FPNG_TPU_GUE", "2048"))  # units per window walk


def _unit_decode(d, tbl_rows, sub8):
    """desc tile (sub8, 128) -> (val uint32, n int32, ts int32)."""
    sym = d & 511
    use_t = (d >> 9) & 1
    en = (d >> DESC_EXTRA_N_SHIFT) & 7
    ev = ((d >> DESC_EXTRA_VAL_SHIFT) & 0x1FFF).astype(jnp.uint32)
    ts = (d >> 26) & 1

    col = sym & 127
    rowi = sym >> 7
    e = jnp.zeros((sub8, 128), jnp.int32)
    for r in range(3):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(tbl_rows[r], (sub8, 128)), col, axis=1)
        e = jnp.where(rowi == r, cand, e)
    code = (e & 0xFFFF).astype(jnp.uint32)
    sz = e >> 16
    sz = jnp.where(use_t == 1, sz, 0)
    code = jnp.where(use_t == 1, code, jnp.uint32(0))
    val = code | (ev << sz.astype(jnp.uint32))
    n = sz + en
    return val, n, ts


def _make_encfuse_kernel(hbm: bool = False):
    def kernel(base_ref, desc0_ref, desc1_ref, desc2_ref, desc3_ref,
               tbl_ref, out_ref, tot_ref, ltk_ref, *scr):
        if hbm:
            pending, prevr, carry, ltokv, win_buf, sem = scr
        else:
            pending, prevr, carry, ltokv = scr
            win_buf = sem = None
        _encfuse_body(base_ref, desc0_ref, desc1_ref, desc2_ref,
                      desc3_ref, tbl_ref, out_ref, tot_ref, ltk_ref,
                      pending, prevr, carry, ltokv,
                      hbm_t=((win_buf, sem, pl.program_id(0))
                             if hbm else None))

    return kernel


def _encfuse_body(base_ref, desc0_ref, desc1_ref, desc2_ref, desc3_ref,
                  tbl_ref, out_ref, tot_ref, ltk_ref, pending, prevr,
                  carry, ltokv, hbm_t=None):
    b = pl.program_id(0)
    t = pl.program_id(1)
    sub8 = 8 * _SUB

    @pl.when(t == 0)
    def _():
        pending[...] = jnp.zeros_like(pending)
        carry[0] = base_ref[b, 0]
        ltokv[...] = jnp.full_like(ltokv, -1)
        prevr[0] = (base_ref[b, 0] >> 5) // 128

    grows = _GUE // 128
    idxv = (jax.lax.broadcasted_iota(jnp.int32, (grows, 128), 0) * 128 +
            jax.lax.broadcasted_iota(jnp.int32, (grows, 128), 1)) \
        .reshape(_GUE)
    # lane-dim inclusive-cumsum operator (MXU-exact: bf16 operands are
    # small ints, accumulation is f32 and row sums stay < 2^24)
    lt128 = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) <=
             jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)) \
        .astype(jnp.bfloat16)
    subl = jax.lax.broadcasted_iota(jnp.int32, (sub8, 128), 0)
    tbl_rows = [tbl_ref[0, r:r + 1, :] for r in range(3)]

    # --- step-wide quad decode + merge + offsets -------------------------
    # Stream units arrive de-interleaved 4 ways: desc_k holds stream
    # positions 4i+k at the same (row, lane).  An adjacent PAIR always
    # fits one uint32 (literal/filter/EOB codes are <= 12 bits, a match
    # unit is <= 18, and two match units can never be adjacent - a match
    # occupies a pixel's first byte and pixels are >= 3 units apart - so
    # a pair is <= 30 bits); two pairs merge into one 64-bit deposit
    # unit (lo, hi words), quartering the units the cumsum and the
    # deposit walks have to move.
    val0, n0, ts0 = _unit_decode(desc0_ref[0, 0, :, :], tbl_rows, sub8)
    val1, n1, ts1 = _unit_decode(desc1_ref[0, 0, :, :], tbl_rows, sub8)
    val2, n2, ts2 = _unit_decode(desc2_ref[0, 0, :, :], tbl_rows, sub8)
    val3, n3, ts3 = _unit_decode(desc3_ref[0, 0, :, :], tbl_rows, sub8)
    va = val0 | (val1 << n0.astype(jnp.uint32))
    na = n0 + n1
    vb = val2 | (val3 << n2.astype(jnp.uint32))
    nb = n2 + n3
    na_u = na.astype(jnp.uint32)
    v_lo = va | (vb << na_u)
    v_hi = (vb >> jnp.uint32(1)) >> (jnp.uint32(31) - na_u)
    n = na + nb

    s_inc = jnp.dot(n.astype(jnp.bfloat16), lt128,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    # exclusive row prefix: int32 Kogge-Stone over sublanes (an f32
    # matmul here rounds - TPU f32 matmuls run at reduced precision)
    s = jnp.broadcast_to(s_inc[:, 127:128], (sub8, 128))
    sh_ = 1
    while sh_ < sub8:
        s = s + jnp.where(subl >= sh_, pltpu.roll(s, sh_, 0), 0)
        sh_ *= 2
    rb = jnp.where(subl >= 1, pltpu.roll(s, 1, 0), 0)
    cb = carry[0]
    offs = cb + rb + s_inc - n
    carry[0] = cb + jnp.sum(n)
    # last token start: vector running max, reduced once at the end
    # (sub-unit k starts sum(n_<k) bits into the quad)
    lt = jnp.maximum(jnp.where(ts0 == 1, offs, -1),
                     jnp.where(ts1 == 1, offs + n0, -1))
    lt = jnp.maximum(lt, jnp.where(ts2 == 1, offs + na, -1))
    lt = jnp.maximum(lt, jnp.where(ts3 == 1, offs + na + n2, -1))
    ltokv[...] = jnp.maximum(ltokv[...], lt)

    # scalar running bit offset per deposit group: each group's first-unit
    # word row feeds _window_deposit's straight-line first window
    gbits = cb
    for k in range((8 * _SUB) // grows):
        vf = v_lo[grows * k:grows * (k + 1), :].reshape(_GUE)
        vh = v_hi[grows * k:grows * (k + 1), :].reshape(_GUE)
        of = offs[grows * k:grows * (k + 1), :].reshape(_GUE)
        _window_deposit(vf, of, idxv, _WLE, out_ref, pending, prevr,
                        base0=(gbits >> 5) // 128, vals_hi=vh, hbm=hbm_t)
        gbits = gbits + jnp.sum(n[grows * k:grows * (k + 1), :])

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        tot_ref[b, 0] = carry[0]
        ltk_ref[b, 0] = jnp.max(ltokv[...])


@functools.partial(jax.jit, static_argnames=("num_words", "interpret"))
def encode_bits_fused(desc: jnp.ndarray, tbl: jnp.ndarray,
                      base_bits: jnp.ndarray, num_words: int,
                      interpret: bool = False):
    """Fused lookup+offsets+deposit over a (B, N) desc stream.

    tbl: (B, 8, 128) int32 packed code | size<<16 (entries 0..287 in rows
    0..2); base_bits: (B,) int32 start offsets (serialized prefix bits).
    Returns (words (B, num_words) uint32, total_bits (B,), last_tok (B,)).
    """
    B, N = desc.shape
    step = _U * _SUB          # merged quads per grid step
    N4 = -(-N // 4)           # quads in the stream
    T = -(-N4 // step)
    pad = 4 * T * step - N
    if pad:
        desc = jnp.concatenate(
            [desc, jnp.zeros((B, pad), desc.dtype)], axis=1)
    sub8 = 8 * _SUB
    # de-interleave 4 ways: stream positions 4i+k land at the same
    # (row, lane) of four tiles so the kernel merges quads elementwise
    desc4 = desc.astype(jnp.int32).reshape(B, T * step, 4)
    descs = [desc4[:, :, k].reshape(B, T, sub8, 128) for k in range(4)]
    rows = -(-num_words // 128) + _WRE + 1

    tile_spec = pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM)
    # Word buffers past the default Mosaic scoped-VMEM budget (large
    # rasters - a 4K image's ~25MB arena) stay VMEM-resident under a
    # raised per-kernel limit (see ops/bitpack: the HBM staged-DMA mode
    # is interpret-correct but faults on real hardware, so it is
    # env-gated off; FPNG_TPU_DEP_HBM=1 re-enables it for debugging).
    from .bitpack import _DEP_BLOCK_MAX, _DEP_VMEM_BYTES, _DEP_VMEM_LIMIT
    hbm = _os.environ.get("FPNG_TPU_DEP_HBM", "") == "1"
    big_blk = rows * 512 > _DEP_VMEM_BYTES and not hbm
    if big_blk:
        assert rows * 512 <= _DEP_BLOCK_MAX, \
            (num_words, "raster too large for the device encoder")
    scratch = [
        pltpu.VMEM((2 * _WRE, 128), jnp.uint32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.VMEM((sub8, 128), jnp.int32),
    ]
    if hbm:
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [pltpu.VMEM((_WRE, 128), jnp.uint32),
                    pltpu.SemaphoreType.DMA]
    else:
        out_spec = pl.BlockSpec((1, rows, 128), lambda b, t: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    params = {}
    if big_blk and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_DEP_VMEM_LIMIT)
    out, tot, ltk = pl.pallas_call(
        _make_encfuse_kernel(hbm=hbm),
        grid=(B, T),
        **params,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            tile_spec, tile_spec, tile_spec, tile_spec,
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            out_spec,
            pl.BlockSpec((B, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(base_bits.astype(jnp.int32).reshape(B, 1), *descs,
      tbl.astype(jnp.int32))
    return (out.reshape(B, rows * 128)[:, :num_words],
            tot[:, 0], ltk[:, 0])


def materialize_units(desc, codes, sizes):
    """XLA twin of the kernel's per-unit decode (CPU fallback + oracle).

    desc (B, N) int32; codes (B, 288) uint32; sizes (B, 288) int32.
    Returns (vals uint32, nbits int32, tok_start bool), each (B, N).
    """
    sym = desc & 511
    use_t = (desc >> 9) & 1
    en = (desc >> DESC_EXTRA_N_SHIFT) & 7
    ev = ((desc >> DESC_EXTRA_VAL_SHIFT) & 0x1FFF).astype(jnp.uint32)
    ts = ((desc >> 26) & 1) == 1
    code = jnp.take_along_axis(codes, sym, axis=1)
    sz = jnp.take_along_axis(sizes, sym, axis=1)
    sz = jnp.where(use_t == 1, sz, 0)
    code = jnp.where(use_t == 1, code, jnp.uint32(0))
    vals = code | (ev << sz.astype(jnp.uint32))
    nbits = sz + en
    return vals, nbits, ts


def pack_table(codes, sizes):
    """(B, 288) uint32/int32 -> (B, 8, 128) int32 code | size<<16 tiles."""
    B = codes.shape[0]
    packed = (codes.astype(jnp.int32) |
              (sizes.astype(jnp.int32) << 16))
    return jnp.pad(packed, ((0, 0), (0, 1024 - 288))).reshape(B, 8, 128)


# ---------------------------------------------------------------------------
# 32bpp one-pass cost check (fpng.cpp:1520-1528) as a tiny gather kernel
# ---------------------------------------------------------------------------

_SUBP = 8  # pixel sub-tiles per grid step


def _gather_size(tbl_rows, sym):
    col = sym & 127
    rowi = sym >> 7
    e = jnp.zeros((8, 128), jnp.int32)
    for r in range(3):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(tbl_rows[r], (8, 128)), col, axis=1)
        e = jnp.where(rowi == r, cand, e)
    return e >> 16


def _demote_kernel(tbl_ref, dch_ref, ls_ref, le_ref, cd_ref, out_ref):
    sub8 = 8 * _SUBP
    tbl_rows = [tbl_ref[0, r:r + 1, :] for r in range(3)]
    for k in range(_SUBP):
        lit_sum = jnp.zeros((8, 128), jnp.int32)
        for c in range(4):
            lit_sum += _gather_size(
                tbl_rows, dch_ref[0, 0, c * sub8 + 8 * k:
                                  c * sub8 + 8 * (k + 1), :])
        msz = _gather_size(tbl_rows, ls_ref[0, 0, 8 * k:8 * (k + 1), :])
        le = le_ref[0, 0, 8 * k:8 * (k + 1), :]
        cd = cd_ref[0, 0, 8 * k:8 * (k + 1), :]
        out_ref[0, 0, 8 * k:8 * (k + 1), :] = \
            ((cd != 0) & (msz + le + 1 > lit_sum)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def demote_mask_tpu(deltas, len_sym, len_extra, cand, tbl,
                    interpret: bool = False):
    """Single-pixel matches that are strictly cheaper as 4 literals.

    deltas (B, H, W, 4) uint8; len_sym/len_extra (B, H, W) int32;
    cand (B, H, W) bool (1-px match starts); tbl as pack_table.
    Returns (B, H, W) bool.
    """
    B, H, W, Cc = deltas.shape
    Np = H * W
    step = 1024 * _SUBP  # pixels per grid step (sub8 x 128)
    Tp = -(-Np // step)
    padn = Tp * step - Np
    sub8 = 8 * _SUBP

    def pad2(x):
        x = x.reshape(B, Np)
        if padn:
            x = jnp.concatenate(
                [x, jnp.zeros((B, padn), x.dtype)], axis=1)
        return x

    dch = jnp.moveaxis(deltas.astype(jnp.int32), 3, 1).reshape(B, 4, Np)
    if padn:
        dch = jnp.concatenate(
            [dch, jnp.zeros((B, 4, padn), jnp.int32)], axis=2)
    # (B, Tp, 4*sub8, 128): channel planes stacked along sublanes
    dch4 = jnp.moveaxis(dch.reshape(B, 4, Tp, sub8, 128), 1, 2) \
        .reshape(B, Tp, 4 * sub8, 128)
    ls4 = pad2(len_sym).astype(jnp.int32).reshape(B, Tp, sub8, 128)
    le4 = pad2(len_extra).astype(jnp.int32).reshape(B, Tp, sub8, 128)
    cd4 = pad2(cand.astype(jnp.int32)).reshape(B, Tp, sub8, 128)

    out = pl.pallas_call(
        _demote_kernel,
        grid=(B, Tp),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * sub8, 128), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, sub8, 128), jnp.int32),
        interpret=interpret,
    )(tbl.astype(jnp.int32), dch4, ls4, le4, cd4)
    return (out.reshape(B, Tp * step)[:, :Np] != 0).reshape(B, H, W)
