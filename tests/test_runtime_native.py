"""Differential tests: native host runtime (C++) vs the pure-Python twins.

The native layer (fpng_tpu/runtime/native.cpp) must be byte/status-exact
with container.py / golden.py, which are themselves validated against the
compiled reference library elsewhere (test_cross_reference.py).
"""

import os
import zlib

import numpy as np
import pytest

import fpng_tpu as F
from fpng_tpu import constants as C
from fpng_tpu import container, runtime
from fpng_tpu.bitio import BitReader
from fpng_tpu.golden import _parse_dynamic_header
from fpng_tpu.ops.specdec import pack_lut

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime unavailable")


def test_checksums_match_zlib():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 63, 5551, 5552, 5553, 100000):
        data = rng.integers(0, 256, n, np.uint8).tobytes()
        assert runtime.crc32(data) == zlib.crc32(data)
        assert runtime.crc32(data, 0xDEADBEEF) == zlib.crc32(data, 0xDEADBEEF)
        assert runtime.adler32(data) == zlib.adler32(data)
        assert runtime.adler32(data, 0x12345678) == \
            zlib.adler32(data, 0x12345678)


def _sample_pngs():
    rng = np.random.default_rng(1)
    imgs3 = rng.integers(0, 256, (2, 13, 17, 3), np.uint8)
    imgs3[:, 4:9] = 3
    imgs4 = rng.integers(0, 256, (2, 8, 21, 4), np.uint8)
    imgs4[:, :, 5:15] = 77
    out = []
    for flags in (0, C.FPNG_ENCODE_SLOWER, C.FPNG_FORCE_UNCOMPRESSED):
        out += F.encode_batch(imgs3, flags)
        out += F.encode_batch(imgs4, flags)
    return out


def test_get_info_parity():
    pngs = _sample_pngs()
    for png in pngs:
        assert runtime.get_info_internal(png) == \
            container.get_info_internal(png)
        # corruptions: truncation, header bit flips, chunk-type damage
        for cut in (0, 7, 20, 40, len(png) // 2, len(png) - 1):
            assert runtime.get_info_internal(png[:cut]) == \
                container.get_info_internal(png[:cut])
        for pos in (9, 18, 25, 37, 41, 51, len(png) - 6):
            bad = bytearray(png)
            bad[pos] ^= 0x40
            assert runtime.get_info_internal(bytes(bad)) == \
                container.get_info_internal(bytes(bad)), pos


def test_get_info_rejects_general_png(tmp_path):
    # a PNG without fdEC (written by lodepng-class encoders) => NOT_FPNG
    import struct

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(chunk[4:]))
    raw = zlib.compress(bytes(4 * (1 + 12)))
    idat = struct.pack(">I", len(raw)) + b"IDAT" + raw
    idat += struct.pack(">I", zlib.crc32(idat[4:]))
    iend = struct.pack(">I", 0) + b"IEND"
    iend += struct.pack(">I", zlib.crc32(iend[4:]))
    png = C.PNG_SIG + chunk + idat + iend
    assert runtime.get_info_internal(png) == container.get_info_internal(png)
    assert runtime.get_info_internal(png)[0] == C.FPNG_DECODE_NOT_FPNG


def test_parse_dyn_header_parity():
    for png in _sample_pngs():
        st, w, h, ch, ofs, ln = container.get_info_internal(png)
        if st != C.FPNG_DECODE_SUCCESS:
            continue
        src = png[ofs + 8:]
        if (src[2] & 6) == 0:
            continue  # stored
        r = BitReader(src)
        r.skip(16)
        assert r.get(1) == 1 and r.get(2) == 2
        lut_py = _parse_dynamic_header(r, ch)
        res = runtime.parse_dyn_header(src, ch)
        assert (lut_py is None) == (res is None)
        if res is not None:
            lut_n, p0 = res
            assert p0 == r.bit_pos
            assert np.array_equal(pack_lut(lut_py), lut_n)
        # wrong channel count must reject identically
        other = 7 - ch
        r2 = BitReader(src)
        r2.skip(19)
        py2 = _parse_dynamic_header(r2, other)
        n2 = runtime.parse_dyn_header(src, other)
        assert (py2 is None) == (n2 is None)
        # corrupted header bits
        for pos in (4, 5, 6, 9, 12):
            bad = bytearray(src)
            bad[pos] ^= 0x11
            rb = BitReader(bytes(bad))
            rb.skip(19)
            pyb = _parse_dynamic_header(rb, ch)
            nb = runtime.parse_dyn_header(bytes(bad), ch)
            assert (pyb is None) == (nb is None)
            if nb is not None:
                assert nb[1] == rb.bit_pos
                assert np.array_equal(pack_lut(pyb), nb[0])


def _emit_header_stream(lit_sizes, dist_sizes):
    """Serialize a zlib hdr + BFINAL + dynamic block header for arbitrary
    lit/dist code-length vectors (no num_lit cap, unlike the encoder's
    emitter) - lets tests craft tables containing reserved syms 286/287."""
    from fpng_tpu.bitio import BitWriter
    from fpng_tpu.constants import CLEN_CODE_LIMIT, CLEN_ORDER
    from fpng_tpu.huffman import (_CLEN_EXTRA_BITS, _pack_code_sizes,
                                  build_code_sizes, canonical_codes)

    num_lit = 288
    while num_lit > 257 and lit_sizes[num_lit - 1] == 0:
        num_lit -= 1
    num_dist = 30
    while num_dist > 1 and dist_sizes[num_dist - 1] == 0:
        num_dist -= 1
    concat = np.concatenate([lit_sizes[:num_lit], dist_sizes[:num_dist]])
    packed, clen_freq = _pack_code_sizes(concat)
    clen_sizes, clen_nc = build_code_sizes(clen_freq, CLEN_CODE_LIMIT)
    clen_codes = canonical_codes(clen_sizes, clen_nc, CLEN_CODE_LIMIT)
    w = BitWriter()
    w.put_and_drain(C.ZLIB_HDR0, 8)
    w.put_and_drain(C.ZLIB_HDR1, 8)
    w.put_and_drain(1, 1)  # BFINAL
    w.put_and_drain(2, 2)  # BTYPE = dynamic
    w.put_and_drain(num_lit - 257, 5)
    w.put_and_drain(num_dist - 1, 5)
    nbl = 18
    while nbl >= 0 and clen_sizes[CLEN_ORDER[nbl]] == 0:
        nbl -= 1
    nbl = max(4, nbl + 1)
    w.put_and_drain(nbl - 4, 4)
    for i in range(nbl):
        w.put_and_drain(int(clen_sizes[CLEN_ORDER[i]]), 3)
    for sym, extra in packed:
        w.put_and_drain(int(clen_codes[sym]), int(clen_sizes[sym]))
        if sym >= 16:
            w.put_and_drain(extra, _CLEN_EXTRA_BITS[sym])
    w.force_flush()
    return w.getvalue() + bytes(16)


def test_parse_dyn_header_reserved_syms_parity():
    """Crafted table with codes for reserved syms 286/287: the native LUT
    packing must keep sym|clen with zero geometry exactly like pack_lut
    (a zeroed entry would freeze walk lanes and degrade the fixpoint)."""
    lit_sizes = np.full(288, 9, np.uint8)
    lit_sizes[:16] = 6
    lit_sizes[272:] = 6  # includes 286/287; Kraft: 32/64 + 256/512 = 1
    dist_sizes = np.zeros(30, np.uint8)
    dist_sizes[2] = 1  # distance 3 (3ch)
    dist_sizes[3] = 1  # 2nd valid dist code (wuffs-rule shape)
    src = _emit_header_stream(lit_sizes, dist_sizes)

    r = BitReader(src)
    r.skip(16)
    assert r.get(1) == 1 and r.get(2) == 2
    lut_py = _parse_dynamic_header(r, 3)
    assert lut_py is not None
    res = runtime.parse_dyn_header(src, 3)
    assert res is not None
    lut_n, p0 = res
    assert p0 == r.bit_pos
    packed_py = pack_lut(lut_py)
    # the crafted table really exercises the reserved range
    assert ((packed_py & 511) >= 286).any()
    assert np.array_equal(packed_py, lut_n)


def test_build_tables_batch_parity(rng):
    """fp_build_tables_batch must be byte/field-exact with the Python
    huffman pipeline over varied histogram shapes."""
    from fpng_tpu.models.encoder import _build_tables_python

    hists = []
    # realistic: histograms from actual images
    for c, shape in ((3, (9, 31)), (4, (16, 8))):
        from fpng_tpu import golden
        img = rng.integers(0, 256, (*shape, c), dtype=np.uint8)
        img[2:5] = 7
        filt = golden.filter_image(img)
        h = golden.histogram_tokens(golden.tokenize_image(filt, c))
        hists.append((h.astype(np.uint32), c))
    # edge cases: single symbol, two symbols, flat, huge counts, zeros
    e = np.zeros(288, np.uint32); e[65] = 1000
    hists.append((e, 3))
    e2 = np.zeros(288, np.uint32); e2[0] = 1; e2[285] = 3
    hists.append((e2, 4))
    hists.append((np.full(288, 7, np.uint32), 3))
    big = rng.integers(0, 2**31, 288, dtype=np.int64).astype(np.uint32)
    hists.append((big, 4))
    hists.append((np.zeros(288, np.uint32), 3))

    for h, c in hists:
        batch = np.stack([h, h])
        nc_, ns_, np_, pv_, pn_ = runtime.build_tables_batch(batch, c)
        pc, ps, pp, pb, ppv, ppn = _build_tables_python(batch, c)
        assert np.array_equal(nc_, pc), c
        assert np.array_equal(ns_, ps), c
        assert np_ == pp
        assert np.array_equal(pv_, ppv) and np.array_equal(pn_, ppn)


def test_assemble_batch_used_and_correct():
    """encode_batch with native runtime == pure-python assembly."""
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (3, 9, 14, 3), np.uint8)
    imgs[:, 3:6] = 250
    native = F.encode_batch(imgs, 0)
    os.environ["FPNG_TPU_NO_NATIVE"] = "1"
    try:
        runtime._tried = False
        runtime._lib = None
        assert not runtime.available()
        python = F.encode_batch(imgs, 0)
    finally:
        del os.environ["FPNG_TPU_NO_NATIVE"]
        runtime._tried = False
        runtime._lib = None
    assert native == python
