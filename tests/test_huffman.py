"""Huffman construction + dynamic header codec unit tests."""

import numpy as np
import pytest

from fpng_tpu import constants as C
from fpng_tpu.bitio import BitReader, BitWriter
from fpng_tpu.golden import _parse_dynamic_header
from fpng_tpu.huffman import (
    adjust_freq32,
    build_code_sizes,
    build_decoder_table,
    build_tables,
    canonical_codes,
    emit_dynamic_block_header,
)


def kraft_sum(sizes):
    return sum(2.0 ** -int(s) for s in sizes if s)


@pytest.mark.parametrize("seed", range(8))
def test_code_sizes_kraft_complete(seed):
    rng = np.random.default_rng(seed)
    freqs = rng.integers(0, 1000, 288).astype(np.uint16)
    freqs[256] = 1
    sizes, _ = build_code_sizes(freqs, 12)
    assert sizes.max() <= 12
    assert (sizes[freqs > 0] > 0).all()
    assert (sizes[freqs == 0] == 0).all()
    n_used = int((freqs > 0).sum())
    if n_used > 1:
        assert abs(kraft_sum(sizes) - 1.0) < 1e-12
    # higher freq never gets a longer code (stable order: ties grouped
    # index-ascending, matching the builder's tie-breaking)
    order = np.argsort(freqs, kind="stable")
    s = sizes[order]
    f = freqs[order]
    nz = f > 0
    assert (np.diff(s[nz].astype(int)) <= 0).all()


def test_single_symbol_table():
    freqs = np.zeros(288, np.uint16)
    freqs[42] = 7
    sizes, nc = build_code_sizes(freqs, 12)
    assert sizes[42] == 1
    codes = canonical_codes(sizes, nc, 12)
    assert codes[42] == 0


def test_canonical_codes_prefix_free():
    rng = np.random.default_rng(3)
    freqs = rng.integers(0, 100, 288).astype(np.uint16)
    freqs[:257] = np.maximum(freqs[:257], 1)
    sizes, nc = build_code_sizes(freqs, 12)
    codes = canonical_codes(sizes, nc, 12)
    # decode table must be buildable (implies prefix-free + complete)
    assert build_decoder_table(288, sizes) is not None
    # every code decodes back to its symbol through the LUT
    lut = build_decoder_table(288, sizes)
    for sym in range(288):
        if sizes[sym]:
            entry = int(lut[int(codes[sym])])
            assert (entry & 511) == sym
            assert (entry >> 9) & 15 == sizes[sym]


def test_decoder_table_rejects_oversubscribed():
    sizes = np.zeros(288, np.uint8)
    sizes[:5] = 1  # 5 one-bit codes: invalid
    assert build_decoder_table(288, sizes) is None


def test_adjust_freq32_properties():
    f = np.array([0, 1, 10, 1000, 2 ** 31], np.uint64)
    out = adjust_freq32(f)
    assert out[0] == 0
    assert (out[1:] >= 1).all()
    assert out.dtype == np.uint16


def test_header_emit_parse_roundtrip():
    rng = np.random.default_rng(11)
    for ch in (3, 4):
        freq = rng.integers(0, 5000, 288).astype(np.uint32)
        freq[286:] = 0
        freq[256] = 1
        t = build_tables(freq, ch)
        w = BitWriter()
        w.put_and_drain(1, 1)  # BFINAL placeholder so header isn't byte 0
        emit_dynamic_block_header(w, t)
        w.force_flush()
        r = BitReader(w.getvalue() + b"\0" * 8)
        r.skip(1)
        r.skip(2)  # BTYPE bits emitted by the header writer
        lut = _parse_dynamic_header(r, ch)
        assert lut is not None
        # every emitted lit code decodes back through the parsed LUT
        for sym in range(288):
            if t.lit_sizes[sym]:
                e = int(lut[int(t.lit_codes[sym])])
                assert (e & 511) == sym


def test_dist_table_shape():
    for ch in (3, 4):
        freq = np.ones(288, np.uint32)
        t = build_tables(freq, ch)
        ds = C.DIST_SYM[ch]
        assert t.dist_sizes[ds] == 1 and t.dist_codes[ds] == 0
        assert t.dist_sizes[ds + 1] == 1 and t.dist_codes[ds + 1] == 1
        assert int((t.dist_sizes > 0).sum()) == 2
