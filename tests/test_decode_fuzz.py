"""zzuf-style decoder fuzzing (SURVEY §4, README.md:185-189 analog).

The reference drives fpng_decode_memory with zzuf-corrupted files under
FPNG_DISABLE_DECODE_CRC32_CHECKS so payload corruption reaches the
parser.  This suite applies seeded byte corruption, truncation, and
chunk-surgery to valid files and asserts the decoder NEVER raises -
every outcome is a status code (success only if the pixels were
genuinely unaffected or the stream still parses cleanly).
"""

import numpy as np
import pytest

import fpng_tpu as F
from fpng_tpu import constants as C


@pytest.fixture(scope="module")
def valid_pngs(rng):
    imgs = [
        (rng.normal(120, 30, (24, 31, 3)).clip(0, 255)).astype(np.uint8),
        np.full((20, 20, 4), 7, np.uint8),
    ]
    out = []
    for img in imgs:
        for flags in (0, C.FPNG_ENCODE_SLOWER, C.FPNG_FORCE_UNCOMPRESSED):
            out.append((F.encode_batch(img[None], flags)[0], img))
    return out


def _decode_never_raises(data: bytes):
    st, out, w, h, ch = F.fpng_decode_memory(data, 4)
    assert st in range(14)
    if st == C.FPNG_DECODE_SUCCESS:
        assert out is not None and out.shape == (h, w, 4)
    return st


def test_byte_corruption(valid_pngs, rng, monkeypatch):
    monkeypatch.setenv("FPNG_TPU_DISABLE_DECODE_CRC32_CHECKS", "1")
    for png, img in valid_pngs:
        arr = np.frombuffer(png, np.uint8).copy()
        for _ in range(24):
            bad = arr.copy()
            n = int(rng.integers(1, 6))
            pos = rng.integers(0, len(bad), n)
            bad[pos] ^= rng.integers(1, 256, n).astype(np.uint8)
            _decode_never_raises(bad.tobytes())


def test_truncation(valid_pngs, rng):
    for png, img in valid_pngs[:3]:
        for _ in range(12):
            cut = int(rng.integers(0, len(png)))
            _decode_never_raises(png[:cut])
        for k in (0, 1, 7, 8, 12, 33, 40, 45, 57, 58, 59):
            _decode_never_raises(png[:k])


def test_chunk_surgery(valid_pngs, rng, monkeypatch):
    monkeypatch.setenv("FPNG_TPU_DISABLE_DECODE_CRC32_CHECKS", "1")
    png, img = valid_pngs[0]
    # length-field corruption
    for ofs in (8, 33, 46):
        for v in (0, 1, 0xFFFF, 0x7FFFFFFF):
            bad = bytearray(png)
            bad[ofs:ofs + 4] = int(v).to_bytes(4, "big")
            _decode_never_raises(bytes(bad))
    # duplicated fdEC / IDAT chunks, dropped fdEC
    fdec = png.index(b"fdEC") - 4
    idat = png.index(b"IDAT") - 4
    chunk_fdec = png[fdec:fdec + 12 + 5]
    _decode_never_raises(png[:fdec] + chunk_fdec + png[fdec:])
    _decode_never_raises(png[:fdec] + png[fdec + len(chunk_fdec):])
    idat_len = int.from_bytes(png[idat:idat + 4], "big")
    chunk_idat = png[idat:idat + 12 + idat_len]
    _decode_never_raises(png[:idat] + chunk_idat + png[idat:])


def test_random_garbage(rng):
    for n in (0, 1, 7, 8, 40, 100, 4096):
        _decode_never_raises(bytes(rng.integers(0, 256, n, np.uint8)))
        sig = bytes((137, 80, 78, 71, 13, 10, 26, 10))
        _decode_never_raises(
            sig + bytes(rng.integers(0, 256, max(n, 1), np.uint8)))


def test_header_bitflips_statuses(valid_pngs, rng):
    """Every single-bit flip in the 58-byte header region yields a valid
    status, and flips that keep the file well-formed still roundtrip."""
    png, img = valid_pngs[0]
    for byte in range(0, 58):
        for bit in (0, 7):
            bad = bytearray(png)
            bad[byte] ^= 1 << bit
            st = _decode_never_raises(bytes(bad))
            assert st in range(14)
