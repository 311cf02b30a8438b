"""PNG container build / chunk-walk tests (fpng_get_info semantics)."""

import struct
import zlib

import numpy as np

import fpng_tpu as F
from fpng_tpu import constants as C
from fpng_tpu import container, golden


def _png(rng, h=6, w=5, c=3, flags=0):
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    return golden.encode_image_to_memory(img, w, h, c, flags), img


def test_header_layout(rng):
    png, _ = _png(rng)
    assert png[:8] == C.PNG_SIG
    assert png[8:16] == struct.pack(">I", 13) + b"IHDR"
    assert struct.unpack(">II", png[16:24]) == (5, 6)
    assert png[24] == 8 and png[25] == 2  # bitdepth, color type RGB
    assert png[33:41] == struct.pack(">I", 5) + b"fdEC"
    assert png[41:45] == C.FDEC_SIG and png[45] == C.FDEC_VERSION
    assert png[54:58] == b"IDAT"
    assert png[-12:] == struct.pack(">I", 0) + b"IEND" + png[-4:]


def test_fdec_chunk_crc_valid(rng):
    png, _ = _png(rng)
    crc = struct.unpack(">I", png[46:50])[0]
    assert crc == zlib.crc32(png[37:46]) & 0xFFFFFFFF


def test_idat_crc_valid(rng):
    png, _ = _png(rng)
    idat_len = struct.unpack(">I", png[50:54])[0]
    expect = struct.unpack(">I", png[58 + idat_len:62 + idat_len])[0]
    assert expect == zlib.crc32(png[54:58 + idat_len]) & 0xFFFFFFFF


def test_get_info_ok(rng):
    png, _ = _png(rng, 9, 4, 4)
    assert F.fpng_get_info(png) == (0, 4, 9, 4)


def test_get_info_corruptions(rng):
    png, _ = _png(rng)

    bad = b"JUNK" + png[4:]
    assert F.fpng_get_info(bad)[0] == C.FPNG_DECODE_FAILED_NOT_PNG

    bad = bytearray(png)
    bad[30] ^= 0xFF  # IHDR CRC
    assert F.fpng_get_info(bytes(bad))[0] == C.FPNG_DECODE_FAILED_HEADER_CRC32

    bad = bytearray(png)
    bad[45] ^= 1  # fdEC version
    bad[46:50] = struct.pack(">I", zlib.crc32(bytes(bad[37:46])))
    assert F.fpng_get_info(bytes(bad))[0] == C.FPNG_DECODE_NOT_FPNG

    # strip fdEC chunk entirely -> NOT_FPNG
    stripped = png[:33] + png[50:]
    assert F.fpng_get_info(stripped)[0] == C.FPNG_DECODE_NOT_FPNG

    # truncated
    assert F.fpng_get_info(png[:40])[0] in (
        C.FPNG_DECODE_FAILED_NOT_PNG, C.FPNG_DECODE_FAILED_CHUNK_PARSING)


def test_get_info_rejects_bad_dims():
    hdr = container.build_header(10, 0, 5, 3)
    data = hdr + b"\0" * 30
    assert F.fpng_get_info(data)[0] == C.FPNG_DECODE_FAILED_INVALID_DIMENSIONS


def test_unknown_critical_chunk(rng):
    png, _ = _png(rng)
    # insert a fake critical chunk before IDAT
    fake = struct.pack(">I", 2) + b"XXXX" + b"ab"
    fake += struct.pack(">I", zlib.crc32(fake[4:]))
    patched = png[:50] + fake + png[50:]
    assert F.fpng_get_info(patched)[0] == C.FPNG_DECODE_NOT_FPNG


def test_ancillary_chunk_skipped(rng):
    png, img = _png(rng)
    fake = struct.pack(">I", 3) + b"teXt" + b"abc"
    fake += struct.pack(">I", zlib.crc32(fake[4:]))
    patched = png[:50] + fake + png[50:]
    st, w, h, ch = F.fpng_get_info(patched)
    assert st == 0
    st, out, *_ = F.fpng_decode_memory(patched, 3)
    assert st == 0 and np.array_equal(out, img)


def test_double_idat_rejected(rng):
    png, _ = _png(rng)
    idat_len = struct.unpack(">I", png[50:54])[0]
    idat_chunk = png[50:62 + idat_len]
    patched = png[:62 + idat_len] + idat_chunk + png[62 + idat_len:]
    assert F.fpng_get_info(patched)[0] == C.FPNG_DECODE_NOT_FPNG


def test_crc_check_disable_env(monkeypatch):
    """FPNG_TPU_DISABLE_DECODE_CRC32_CHECKS lets corrupted-CRC payloads
    reach the parser (fuzzing aid, fpng.cpp:50-53 parity)."""
    import numpy as np

    import fpng_tpu as F
    from fpng_tpu import constants as C

    img = np.full((8, 8, 3), 7, np.uint8)
    png = bytearray(F.encode_batch(img[None], 0)[0])
    png[29] ^= 0xFF  # corrupt the IHDR CRC only
    st, *_ = F.fpng_decode_memory(bytes(png), 3)
    assert st == C.FPNG_DECODE_FAILED_HEADER_CRC32
    monkeypatch.setenv("FPNG_TPU_DISABLE_DECODE_CRC32_CHECKS", "1")
    st2, out, w, h, ch = F.fpng_decode_memory(bytes(png), 3)
    assert st2 == C.FPNG_DECODE_SUCCESS
    assert np.array_equal(out, img)
    sts, outs = F.decode_batch([bytes(png)], 3)
    assert sts[0] == C.FPNG_DECODE_SUCCESS


def test_decode_dims_too_large_guard(rng):
    """w*h*desired > 2^32 must return DIMENSIONS_TOO_LARGE from BOTH the
    scalar API and the batched driver (fpng.cpp:3103-3111): the batched
    path must refuse before attempting the allocation."""
    png, _ = _png(rng, h=8, w=8)
    # rewrite IHDR dims to 32768x32768: w*h = 2^30 passes the container
    # pixel limit (MAX_TOTAL_PIXELS_DECODE) but *4 = 2^32 > UINT32_MAX,
    # so the output-allocation guard must fire; fix the IHDR CRC
    big = bytearray(png)
    big[16:24] = struct.pack(">II", 32768, 32768)
    big[29:33] = struct.pack(">I", zlib.crc32(bytes(big[12:29])))
    big = bytes(big)
    st, img, w, h, ch = golden.decode_memory(big, 4)
    assert st == C.FPNG_DECODE_FAILED_DIMENSIONS_TOO_LARGE
    sts, imgs = F.decode_batch([big], 4)
    assert sts[0] == C.FPNG_DECODE_FAILED_DIMENSIONS_TOO_LARGE
    assert imgs[0] is None
