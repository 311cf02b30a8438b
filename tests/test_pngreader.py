"""General PNG reader vs lodepng oracle across color types/depths/filters."""

import ctypes

import numpy as np
import pytest

from fpng_tpu import golden
from fpng_tpu.utils.pngreader import PngError, load_png


def _lodepng_encode(reflib, img, ch):
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    h, w = img.shape[:2]
    err = reflib.lib.ref_lodepng_encode(
        np.ascontiguousarray(img).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)),
        w, h, ch, ctypes.byref(out), ctypes.byref(out_len))
    assert err == 0
    png = ctypes.string_at(out, out_len.value)
    reflib.lib.ref_free(out)
    return png


def test_reads_lodepng_rgb_and_rgba(reflib, rng):
    for c in (3, 4):
        img = rng.integers(0, 256, (23, 31, c), dtype=np.uint8)
        png = _lodepng_encode(reflib, img, c)
        out, w, h, ch = load_png(png, c)
        assert (w, h) == (31, 23)
        assert np.array_equal(out, img)


def test_reads_fpng_files(rng):
    img = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    img[3:6] = 5
    for flags in (0, 1, 2):
        png = golden.encode_image_to_memory(img, 14, 9, 3, flags)
        out, w, h, ch = load_png(png, 3)
        assert np.array_equal(out, img)


def test_alpha_fill_rule(reflib, rng):
    img = rng.integers(0, 256, (5, 5, 3), dtype=np.uint8)
    png = _lodepng_encode(reflib, img, 3)
    out, *_ = load_png(png, 4)
    assert np.all(out[..., 3] == 255)
    assert np.array_equal(out[..., :3], img)


def test_rejects_garbage():
    with pytest.raises(PngError):
        load_png(b"junk" * 20)
    with pytest.raises(PngError):
        load_png(b"\x89PNG\r\n\x1a\n" + b"\0" * 64)


def test_roundtrip_via_reference_harness_styles(reflib, rng):
    """Exercise filters 1/3/4: lodepng picks per-row filters on gradients."""
    x = np.arange(64, dtype=np.uint8)[None, :, None]
    y = np.arange(48, dtype=np.uint8)[:, None, None]
    img = (x * 3 + y * 5 + rng.integers(0, 9, (48, 64, 3))).astype(np.uint8)
    png = _lodepng_encode(reflib, img, 3)
    out, *_ = load_png(png, 3)
    assert np.array_equal(out, img)
