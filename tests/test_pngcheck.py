"""Structural validator (utils/pngcheck.py): every encoder output in
every mode must be chunk-grammar clean, and injected structural damage
must be flagged (the reference's pngcheck claim, README.md:2,81)."""

import struct
import zlib

import numpy as np
import pytest

import fpng_tpu as F
from fpng_tpu import golden
from fpng_tpu.utils.pngcheck import check


def _png(rng, h=23, w=17, c=3, flags=0):
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    return golden.encode_image_to_memory(img, w, h, c, flags)


@pytest.mark.parametrize("flags", [0, F.FPNG_ENCODE_SLOWER,
                                   F.FPNG_FORCE_UNCOMPRESSED])
@pytest.mark.parametrize("c", [3, 4])
def test_outputs_clean(rng, c, flags):
    assert check(_png(rng, c=c, flags=flags)) == []


def test_batch_outputs_clean(rng):
    imgs = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    for png in F.encode_batch(imgs, 0):
        assert check(png) == []


def test_flags_structural_damage(rng):
    png = _png(rng)

    bad = bytearray(png)
    bad[-5] ^= 0xFF  # IEND CRC
    assert any("CRC" in e for e in check(bytes(bad)))

    assert any("signature" in e for e in check(b"\x88" + png[1:]))

    # trailing garbage after IEND
    assert any("trailing" in e for e in check(png + b"xx"))

    # duplicate IEND
    assert any("IEND" in e for e in check(png + png[-12:]))

    # chunk reordering: move fdEC (33..50) before IHDR (8..33)
    reordered = png[:8] + png[33:50] + png[8:33] + png[50:]
    assert any("IHDR is not the first" in e for e in check(reordered))

    # truncation mid-chunk
    assert check(png[:len(png) - 20]) != []

    # zlib corruption with a fixed-up IDAT CRC
    bad = bytearray(png)
    idat_len = struct.unpack(">I", png[50:54])[0]
    bad[60] ^= 0xFF
    bad[58 + idat_len:62 + idat_len] = struct.pack(
        ">I", zlib.crc32(bytes(bad[54:58 + idat_len])))
    assert any("zlib" in e or "IDAT" in e for e in check(bytes(bad)))


def test_flags_bad_ihdr(rng):
    png = _png(rng)
    bad = bytearray(png)
    bad[24] = 7  # illegal bit depth for color type 2
    bad[29:33] = struct.pack(">I", zlib.crc32(bytes(bad[12:29])))
    assert any("depth" in e for e in check(bytes(bad)))
