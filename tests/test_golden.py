"""Golden-model unit tests: filtering, tokenizer, roundtrips, fallbacks."""

import struct
import zlib

import numpy as np
import pytest

import fpng_tpu as F
from fpng_tpu import constants as C
from fpng_tpu import golden


def zlib_reconstruct(png: bytes) -> np.ndarray:
    """Independent (python-zlib based) PNG reconstruction of fpng files."""
    st, w, h, ch = F.fpng_get_info(png)
    assert st == 0
    idat_len = struct.unpack(">I", png[50:54])[0]
    raw = zlib.decompress(png[58:58 + idat_len])
    rows = np.frombuffer(raw, np.uint8).reshape(h, 1 + w * ch)
    out = np.zeros((h, w * ch), np.int64)
    for y in range(h):
        f = rows[y, 0]
        assert f in (0, 2)
        out[y] = rows[y, 1:] + (out[y - 1] if f == 2 else 0)
    return (out % 256).astype(np.uint8).reshape(h, w, ch)


def test_filter_image_roundtrip(rng):
    img = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
    filt = golden.filter_image(img)
    assert filt[0, 0] == 0 and np.all(filt[1:, 0] == 2)
    rec = np.cumsum(filt[:, 1:].astype(np.int64), axis=0).astype(np.uint8)
    assert np.array_equal(rec.reshape(img.shape), img)


def test_tokenizer_greedy_splitting():
    # 200 identical 3ch pixels after the first -> runs of 85, 85, 29
    row = np.tile(np.array([[7, 8, 9]], np.uint8), (200, 1))
    toks = golden.tokenize_row(row)
    assert toks[0][0] == "P"
    assert [t[1] for t in toks[1:]] == [85 * 3, 85 * 3, 29 * 3]

    # 4ch cap is 63 pixels
    row4 = np.tile(np.array([[7, 8, 9, 10]], np.uint8), (65, 1))
    toks4 = golden.tokenize_row(row4)
    assert [t[1] for t in toks4[1:]] == [63 * 4, 1 * 4]


def test_tokenizer_interrupted_runs():
    row = np.array([[1, 1, 1]] * 4 + [[2, 2, 2]] + [[2, 2, 2]] * 3, np.uint8)
    toks = golden.tokenize_row(row)
    # P(111) M(9) P(222) M(9)
    assert [t[0] for t in toks] == ["P", "M", "P", "M"]
    assert toks[1][1] == 9 and toks[3][1] == 9


def test_tokens_reconstruct_stream(rng):
    """Tokens exactly cover each row (literals + match bytes)."""
    img = rng.integers(0, 4, (5, 37, 4), dtype=np.uint8)
    filt = golden.filter_image(img)
    for row_toks in golden.tokenize_image(filt, 4):
        total = sum(4 if k == "P" else (v if k == "M" else 1)
                    for k, v in row_toks)
        assert total == 1 + 37 * 4


@pytest.mark.parametrize("flags", [0, F.FPNG_ENCODE_SLOWER,
                                   F.FPNG_FORCE_UNCOMPRESSED])
def test_roundtrip_all_modes(images, flags):
    for img in images:
        h, w, c = img.shape
        png = golden.encode_image_to_memory(img, w, h, c, flags)
        assert np.array_equal(zlib_reconstruct(png), img)
        st, out, rw, rh, rch = F.fpng_decode_memory(png, c)
        assert st == 0 and (rw, rh, rch) == (w, h, c)
        assert np.array_equal(out, img)


def test_incompressible_falls_back_to_stored(rng):
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    png = golden.encode_image_to_memory(img, 16, 16, 3, 0)
    idat_len = struct.unpack(">I", png[50:54])[0]
    z = png[58:58 + idat_len]
    assert (z[2] & 6) == 0  # stored block marker
    st, out, *_ = F.fpng_decode_memory(png, 3)
    assert st == 0 and np.array_equal(out, img)


def test_tiny_image_stored():
    img = np.array([[[1, 2, 3]]], np.uint8)
    png = golden.encode_image_to_memory(img, 1, 1, 3, F.FPNG_ENCODE_SLOWER)
    st, out, *_ = F.fpng_decode_memory(png, 3)
    assert st == 0 and np.array_equal(out, img)


def test_invalid_encode_args():
    img = np.zeros((2, 2, 3), np.uint8)
    assert golden.encode_image_to_memory(img, 0, 2, 3) is None
    assert golden.encode_image_to_memory(img, 2, 2, 2) is None
    assert golden.encode_image_to_memory(
        np.zeros((1, 1, 3), np.uint8), 1 << 25, 1, 3) is None


def test_decode_invalid_args():
    st, *_ = F.fpng_decode_memory(b"", 4)
    assert st == C.FPNG_DECODE_INVALID_ARG
    st, *_ = F.fpng_decode_memory(b"xx", 5)
    assert st == C.FPNG_DECODE_INVALID_ARG


def test_decode_rejects_standard_png(rng, reflib):
    """A lodepng-written PNG (no fdEC) must return NOT_FPNG."""
    img = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    import ctypes
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    err = reflib.lib.ref_lodepng_encode(
        np.ascontiguousarray(img).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        8, 8, 4, ctypes.byref(out), ctypes.byref(out_len))
    assert err == 0
    png = ctypes.string_at(out, out_len.value)
    reflib.lib.ref_free(out)
    st, *_ = F.fpng_decode_memory(png, 4)
    assert st == C.FPNG_DECODE_NOT_FPNG


def test_alpha_conversion_rules(rng):
    img3 = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    png = golden.encode_image_to_memory(img3, 4, 4, 3, F.FPNG_ENCODE_SLOWER)
    st, out, *_ = F.fpng_decode_memory(png, 4)
    assert st == 0 and np.all(out[..., 3] == 0xFF)
    assert np.array_equal(out[..., :3], img3)

    img4 = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    png = golden.encode_image_to_memory(img4, 4, 4, 4, F.FPNG_ENCODE_SLOWER)
    st, out, *_ = F.fpng_decode_memory(png, 3)
    assert st == 0 and np.array_equal(out, img4[..., :3])


def test_four_channel_cost_check():
    """1-pass 32bpp single-pixel matches may be literals when cheaper.

    Build an image whose repeated pixel has very cheap literals (0 deltas)
    so the cost check favors literals over a len-4 match.
    """
    img = np.zeros((3, 5, 4), np.uint8)
    img[:, :, 3] = 255
    # row 1 == row 0 => deltas all zero => literal bytes are all 0 (cheap)
    png = golden.encode_image_to_memory(img, 5, 3, 4, 0)
    st, out, *_ = F.fpng_decode_memory(png, 4)
    assert st == 0 and np.array_equal(out, img)
