"""Cross-validation against the compiled reference fpng + lodepng oracles.

This is the rebuild's equivalent of the reference harness's
decode-with-five-codecs strategy (fpng_test.cpp:1236-1445): every stream we
emit must be accepted by the reference decoder (and lodepng), and every
reference stream must decode through our decoder - plus 2-pass outputs must
be byte-identical since we reproduce the table construction exactly.
"""

import numpy as np
import pytest

import fpng_tpu as F
from fpng_tpu import golden


def _streams_for(img, flags):
    h, w, c = img.shape
    return golden.encode_image_to_memory(img, w, h, c, flags)


@pytest.mark.parametrize("flags", [0, F.FPNG_ENCODE_SLOWER,
                                   F.FPNG_FORCE_UNCOMPRESSED])
def test_ours_decodable_by_reference(reflib, images, flags):
    for img in images:
        h, w, c = img.shape
        png = _streams_for(img, flags)
        st, out, rw, rh, rch = reflib.decode(png, c)
        assert st == 0, (img.shape, flags, st)
        assert (rw, rh, rch) == (w, h, c)
        assert np.array_equal(out, img), (img.shape, flags)


@pytest.mark.parametrize("flags", [0, F.FPNG_ENCODE_SLOWER,
                                   F.FPNG_FORCE_UNCOMPRESSED])
def test_reference_decodable_by_ours(reflib, images, flags):
    for img in images:
        h, w, c = img.shape
        png = reflib.encode(img, flags)
        assert png is not None
        st, out, rw, rh, rch = F.fpng_decode_memory(png, c)
        assert st == F.FPNG_DECODE_SUCCESS, (img.shape, flags, st)
        assert (rw, rh, rch) == (w, h, c)
        assert np.array_equal(out, img), (img.shape, flags)


def test_two_pass_byte_exact(reflib, images):
    """Our 2-pass output must be byte-identical to the reference encoder."""
    for img in images:
        h, w, c = img.shape
        ours = _streams_for(img, F.FPNG_ENCODE_SLOWER)
        theirs = reflib.encode(img, F.FPNG_ENCODE_SLOWER)
        assert ours == theirs, (img.shape, len(ours), len(theirs))


def test_stored_byte_exact(reflib, images):
    for img in images:
        h, w, c = img.shape
        ours = _streams_for(img, F.FPNG_FORCE_UNCOMPRESSED)
        theirs = reflib.encode(img, F.FPNG_FORCE_UNCOMPRESSED)
        assert ours == theirs, img.shape


@pytest.mark.parametrize("c", [3, 4])
def test_one_pass_sizes_within_1pct_real_corpus(reflib, c):
    """THE size gate (single authoritative bound): 1-pass compressed
    sizes within +-1% two-sided of the reference on REAL photographic
    content (BASELINE.json; the reference's published per-corpus sizes,
    README.md:19-43).  2-pass is byte-exact (test_two_pass_byte_exact),
    so only 1-pass - where our trained tables differ from
    fpng.cpp:532-562's - needs the band.  A former 5% one-sided gate on
    the synthetic fixture was deleted (two inconsistent gates; synthetic
    micro-images measure table-training corpus choice, not codec
    quality).  bench.py re-proves this bound on every hardware run via
    vs_ref_bytes per mode."""
    from fpng_tpu.train import real_corpus

    tiles = list(real_corpus(c, 128))
    if not tiles:
        pytest.skip("example.png fixture unavailable")
    ours = theirs = 0
    for t in tiles:
        h, w, _ = t.shape
        ours += len(_streams_for(t, 0))
        theirs += len(reflib.encode(t, 0))
    assert abs(ours - theirs) <= 0.01 * theirs, \
        (c, ours, theirs, ours / theirs)


def test_lodepng_accepts_ours(reflib, images):
    for img in images[::3]:
        h, w, c = img.shape
        for flags in (0, F.FPNG_ENCODE_SLOWER, F.FPNG_FORCE_UNCOMPRESSED):
            png = _streams_for(img, flags)
            err, out, rw, rh = reflib.lodepng_decode(png)
            assert err == 0, (img.shape, flags, err)
            assert (rw, rh) == (w, h)
            rgba = golden.convert_channels(img, 4)
            assert np.array_equal(out, rgba), (img.shape, flags)


def test_get_info_parity(reflib, images):
    for img in images[::5]:
        h, w, c = img.shape
        for png in (_streams_for(img, 0), reflib.encode(img, 0)):
            ours = F.fpng_get_info(png)
            theirs = reflib.get_info(png)
            assert ours == theirs == (0, w, h, c)


def test_checksum_parity(reflib, rng):
    for n in (0, 1, 3, 64, 1000, 5551, 5553, 70000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert F.fpng_crc32(data) == reflib.crc32(data)
        assert F.fpng_adler32(data) == reflib.adler32(data)


def test_decode_channel_conversion_parity(reflib, rng):
    from tests.conftest import make_test_image
    for c in (3, 4):
        img = make_test_image(rng, 21, 13, c)
        png = _streams_for(img, F.FPNG_ENCODE_SLOWER)
        for desired in (3, 4):
            st_o, out_o, *_ = F.fpng_decode_memory(png, desired)
            st_r, out_r, *_ = reflib.decode(png, desired)
            assert st_o == st_r == 0
            assert np.array_equal(out_o, out_r)
