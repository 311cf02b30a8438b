"""Fused encoder kernel (interpret mode) vs the XLA materialize path.

The fused Pallas kernel (ops/encfuse.py) must reproduce the XLA path's
words/total_bits/last_tok bit-exactly - the XLA path's byte-parity with
the golden model and the compiled reference is covered elsewhere.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fpng_tpu import constants as C
from fpng_tpu.models.encoder import _budget, _len_sym_extra, build_desc
from fpng_tpu.ops.bitpack import exclusive_offsets, scatter_bits
from fpng_tpu.ops.encfuse import (demote_mask_tpu, encode_bits_fused,
                                  materialize_units, pack_table)
from fpng_tpu.tables import get_one_pass_tables
from tests.conftest import make_test_image


def test_len_sym_extra_arith_matches_tables():
    adj = jnp.arange(256, dtype=jnp.int32).reshape(1, 16, 16)
    sym, extra = _len_sym_extra(adj)
    assert np.array_equal(np.asarray(sym).ravel(), C.LEN_SYM)
    assert np.array_equal(np.asarray(extra).ravel(), C.LEN_EXTRA)


def _one_pass_inputs(imgs, Cc):
    B = imgs.shape[0]
    prefix, acc, nacc, codes1, sizes1 = get_one_pass_tables(Cc)
    codes = np.broadcast_to(codes1.astype(np.uint32), (B, 288)).copy()
    sizes = np.broadcast_to(sizes1.astype(np.int32), (B, 288)).copy()
    base = np.full(B, len(prefix) * 8, np.int32)
    pv = np.full(B, acc, np.uint32)
    pn = np.full(B, nacc, np.int32)
    return codes, sizes, base, pv, pn


def _two_pass_tables(imgs, Cc):
    """Per-image tables from the real 2-pass builder (distinct per image)."""
    from fpng_tpu import golden
    from fpng_tpu.huffman import build_tables

    B = imgs.shape[0]
    codes = np.zeros((B, 288), np.uint32)
    sizes = np.zeros((B, 288), np.int32)
    for b in range(B):
        filt = golden.filter_image(imgs[b])
        freq = golden.histogram_tokens(golden.tokenize_image(filt, Cc))
        t = build_tables(freq.astype(np.uint32), Cc)
        codes[b] = t.lit_codes
        sizes[b] = t.lit_sizes
    base = np.full(B, 24, np.int32)  # arbitrary prefix lengths
    base[1:] += 8 * (np.arange(B - 1) % 3)
    pv = np.arange(B).astype(np.uint32) % 128
    pn = np.minimum(np.arange(B) % 8, 7).astype(np.int32)
    return codes, sizes, base, pv, pn


@pytest.mark.parametrize("case", [
    (3, "one", (2, 13, 29)), (3, "one", (1, 64, 64)),
    (4, "one", (2, 16, 21)), (4, "two", (2, 9, 40)),
    (3, "two", (3, 32, 17)), (4, "one", (1, 40, 40)),
])
def test_fused_matches_xla(case, rng):
    Cc, mode, (B, H, W) = case
    imgs = np.stack([make_test_image(rng, H, W, Cc, k)
                     for k in ["mixed", "flat", "noise"][:B]] +
                    [make_test_image(rng, H, W, Cc, "mixed")] * 0)
    if mode == "one":
        codes, sizes, base, pv, pn = _one_pass_inputs(imgs, Cc)
        cost_check = (Cc == 4)
    else:
        codes, sizes, base, pv, pn = _two_pass_tables(imgs, Cc)
        cost_check = False
    budget = _budget(H, W, Cc)
    num_words = max(budget // 4 + 4, 8)

    desc, tbl, *_ = build_desc(
        jnp.asarray(imgs), jnp.asarray(codes), jnp.asarray(sizes),
        jnp.asarray(pv), jnp.asarray(pn), num_chans=Cc,
        cost_check=cost_check)

    vals, nbits, ts = materialize_units(
        desc, jnp.asarray(codes), jnp.asarray(sizes))
    offsets = exclusive_offsets(nbits, jnp.asarray(base))
    want_words = np.asarray(scatter_bits(vals, nbits, offsets, num_words))
    want_total = np.asarray(offsets[:, -1] + nbits[:, -1])
    want_ltok = np.asarray(
        jnp.max(jnp.where(ts, offsets, -1), axis=1))

    got_words, got_total, got_ltok = encode_bits_fused(
        desc, tbl, jnp.asarray(base), num_words, interpret=True)
    got_words = np.asarray(got_words)

    assert np.array_equal(np.asarray(got_total), want_total)
    assert np.array_equal(np.asarray(got_ltok), want_ltok)
    for b in range(imgs.shape[0]):
        nw = (int(want_total[b]) + 31) // 32
        assert np.array_equal(got_words[b, :nw], want_words[b, :nw]), b


def test_fused_hbm_mode_matches_xla(rng):
    """Word budgets past the VMEM limit take the HBM-output mode
    (staged window DMAs) - the path 4K+ encodes use on hardware.  A
    small stream against a >2.6M-word budget flips the mode; words up
    to total_bits must be identical to the XLA path."""
    Cc, B, H, W = 3, 1, 64, 64
    imgs = np.stack([make_test_image(rng, H, W, Cc, "mixed")])
    codes, sizes, base, pv, pn = _one_pass_inputs(imgs, Cc)
    num_words = 2_700_000  # rows*512 > _DEP_VMEM_BYTES => hbm mode

    desc, tbl, *_ = build_desc(
        jnp.asarray(imgs), jnp.asarray(codes), jnp.asarray(sizes),
        jnp.asarray(pv), jnp.asarray(pn), num_chans=Cc,
        cost_check=False)
    vals, nbits, ts = materialize_units(
        desc, jnp.asarray(codes), jnp.asarray(sizes))
    offsets = exclusive_offsets(nbits, jnp.asarray(base))
    want_total = np.asarray(offsets[:, -1] + nbits[:, -1])
    nw = (int(want_total[0]) + 31) // 32
    want_words = np.asarray(scatter_bits(vals, nbits, offsets, nw))

    got_words, got_total, _ = encode_bits_fused(
        desc, tbl, jnp.asarray(base), num_words, interpret=True)
    assert np.array_equal(np.asarray(got_total), want_total)
    assert np.array_equal(np.asarray(got_words)[0, :nw], want_words[0])


def test_demote_kernel_matches_xla(rng):
    B, H, W = 3, 24, 33
    imgs = np.stack([make_test_image(rng, H, W, 4, k)
                     for k in ("mixed", "flat", "noise")])
    codes, sizes, base, pv, pn = _one_pass_inputs(imgs, 4)

    from fpng_tpu.ops.filter import filter_deltas
    from fpng_tpu.ops.tokenize import match_fields

    deltas = filter_deltas(jnp.asarray(imgs))
    eq, mstart, mlen_px = match_fields(deltas, 4)
    adj = jnp.where(mstart, mlen_px * 4 - 3, 0)
    len_sym, len_extra = _len_sym_extra(adj)
    cand = mstart & (mlen_px == 1)
    tbl = pack_table(jnp.asarray(codes), jnp.asarray(sizes))

    got = np.asarray(demote_mask_tpu(
        deltas, len_sym, len_extra, cand, tbl, interpret=True))

    szs = jnp.asarray(sizes)
    d32 = deltas.astype(jnp.int32)
    lit_sz = jnp.take_along_axis(
        szs, d32.reshape(B, -1), axis=1).reshape(B, H, W, 4)
    msz = jnp.take_along_axis(
        szs, len_sym.reshape(B, -1), axis=1).reshape(B, H, W)
    want = np.asarray(cand & (msz + len_extra + 1 > lit_sz.sum(axis=-1)))
    assert np.array_equal(got, want)
    assert want.any()  # the fixture actually exercises demotion
