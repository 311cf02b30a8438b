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


def _window_deposit(vals, offs, idxv, cols, out_ref, pending, prevr):
    """Deposit one flat (_U,) sub-tile of (uint32 value, bit offset) units
    into out_ref through the carried window (pending/prevr scratch).

    The window geometry (word width / row count) follows cols.shape[1] so
    callers can trade one-hot width against window-walk iterations; the
    pending scratch must hold 2x the matching row count.

    Units are sorted by offset but may have arbitrary gaps (the decoder's
    record expansion skips match-covered bytes), so one sub-tile can span
    several deposit windows.  Walk windows with a scalar first-unprocessed
    index; each window covers a contiguous sorted range, so the index
    advances by the in-window count.
    """
    wl_words = cols.shape[1]
    wrows = wl_words // 128
    word = offs >> 5
    sh = (offs & 31).astype(jnp.uint32)
    lo = vals << sh
    hi = (vals >> jnp.uint32(1)) >> (jnp.uint32(31) - sh)

    n_eff = jnp.max(jnp.where((lo | hi) != 0, idxv, -1)) + 1

    def win_body(i0):
        base_row = jnp.min(
            jnp.where(idxv >= i0, word, 0x7FFFFFFF)) // 128
        wl = word - base_row * 128
        in_win = (idxv >= i0) & (wl < wl_words - 1)
        # fold the window mask into wl (Mosaic cannot broadcast an
        # i1 minor dim): out-of-window units match no column
        wl_m = jnp.where(in_win, wl, -1)
        mlo = jnp.where(in_win, lo, 0)
        mhi = jnp.where(in_win, hi, 0)

        def byte_planes(v):
            return jnp.stack(
                [(v >> (8 * j)) & 0xFF for j in range(4)]) \
                .astype(jnp.int32).astype(jnp.bfloat16)
        oh = (cols == wl_m[:, None]).astype(jnp.bfloat16)
        planes = jnp.concatenate([byte_planes(mlo), byte_planes(mhi)])
        m = jnp.dot(planes, oh,
                    preferred_element_type=jnp.float32) \
            .astype(jnp.int32)
        mlo_w, mhi_w = m[:4], m[4:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (4, wl_words), 1)
        mhi_w = jnp.where(lane > 0, pltpu.roll(mhi_w, 1, 1), 0)
        ws = mlo_w + mhi_w
        if wl_words == 1024:
            win = (ws[0] | (ws[1] << 8) | (ws[2] << 16) | (ws[3] << 24)) \
                .astype(jnp.uint32).reshape(wrows, 128)
        else:
            # narrow windows: Mosaic legalizes neither (wl,)->(wrows,128)
            # shape casts nor 1D pads, so assemble rows from column slices
            win = jnp.concatenate(
                [(ws[0:1, 128 * r:128 * (r + 1)] |
                  (ws[1:2, 128 * r:128 * (r + 1)] << 8) |
                  (ws[2:3, 128 * r:128 * (r + 1)] << 16) |
                  (ws[3:4, 128 * r:128 * (r + 1)] << 24))
                 for r in range(wrows)], axis=0).astype(jnp.uint32)

        # d > wrows (gap): the clamped read lands in the zeroed
        # upper half of `pending`
        d = jnp.clip(base_row - prevr[0], 0, wrows)
        shifted = pending[pl.ds(d, wrows), :]
        combined = win + shifted

        out_ref[0, pl.ds(base_row, wrows), :] = combined
        pending[0:wrows, :] = combined
        prevr[0] = base_row
        return i0 + jnp.sum(in_win.astype(jnp.int32))

    jax.lax.while_loop(lambda i0: i0 < n_eff, win_body, jnp.int32(0))


def _flat_idx():
    idxv = jax.lax.broadcasted_iota(jnp.int32, (8, _U // 8), 0) * (_U // 8) \
        + jax.lax.broadcasted_iota(jnp.int32, (8, _U // 8), 1)
    return idxv.reshape(_U)


def _make_deposit_kernel(group: int, wl: int, zero_init: bool):
    """Deposit kernel over `group`-unit window walks with wl-word windows.

    Bigger groups amortize the per-walk fixed cost (scalar window scan,
    dynamic stores) at the price of a wider one-hot; the decoder's
    expansion (fixed 16-bit units) uses group=2048/wl=1152 while the
    encoder fallback keeps 1024/1024.
    """
    grows = group // 128

    def kernel(vals_ref, offs_ref, out_ref, pending, prevr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            pending[...] = jnp.zeros_like(pending)
            prevr[0] = (offs_ref[0, 0, 0, 0] >> 5) // 128
            if zero_init:
                # clear the image's word block on its first grid step so
                # gap words (byte ranges no unit touches) read as zero
                out_ref[...] = jnp.zeros_like(out_ref)

        cols = jax.lax.broadcasted_iota(jnp.int32, (group, wl), 1)
        idxv = (jax.lax.broadcasted_iota(jnp.int32, (grows, 128), 0) * 128 +
                jax.lax.broadcasted_iota(jnp.int32, (grows, 128), 1)) \
            .reshape(group)
        for k in range((_U * _SUB) // group):
            vals = vals_ref[0, 0, grows * k:grows * (k + 1), :] \
                .reshape(group).astype(jnp.uint32)
            offs = offs_ref[0, 0, grows * k:grows * (k + 1), :] \
                .reshape(group)
            _window_deposit(vals, offs, idxv, cols, out_ref, pending,
                            prevr)

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
