"""Device (batched XLA) decoder vs golden model and reference oracle."""

import numpy as np
import pytest

import fpng_tpu as F
from fpng_tpu import golden
from fpng_tpu.models.decoder import decode_batch


@pytest.mark.parametrize("flags", [0, F.FPNG_ENCODE_SLOWER,
                                   F.FPNG_FORCE_UNCOMPRESSED])
@pytest.mark.parametrize("shape", [(13, 17, 3), (8, 8, 4), (64, 64, 4),
                                   (1, 1, 3), (2, 300, 4), (5, 86, 3)])
def test_decode_matches_input(rng, shape, flags):
    h, w, c = shape
    imgs = []
    for i in range(3):
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        if i == 0:
            img[:] = img[0, 0]
        imgs.append(img)
    pngs = [golden.encode_image_to_memory(im, w, h, c, flags) for im in imgs]
    for desired in (3, 4):
        sts, outs = decode_batch(pngs, desired)
        for i, im in enumerate(imgs):
            assert sts[i] == F.FPNG_DECODE_SUCCESS, (shape, flags, i)
            want = golden.convert_channels(im, desired)
            assert np.array_equal(outs[i], want), (shape, flags, i, desired)


def test_decode_reference_files(rng, reflib):
    """Files produced by the reference encoder decode identically."""
    for c in (3, 4):
        img = rng.integers(0, 256, (21, 34, c), dtype=np.uint8)
        img[4:9] = img[0, 0]
        for flags in (0, F.FPNG_ENCODE_SLOWER):
            png = reflib.encode(img, flags)
            sts, outs = decode_batch([png], c)
            assert sts[0] == 0 and np.array_equal(outs[0], img), (c, flags)


def test_decode_mixed_batch(rng):
    """Batch with mixed shapes and a stored-block member."""
    a = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (5, 40, 4), dtype=np.uint8)
    b[1:3] = 7
    pngs = [
        golden.encode_image_to_memory(a, 9, 9, 3, F.FPNG_ENCODE_SLOWER),
        golden.encode_image_to_memory(b, 40, 5, 4, F.FPNG_ENCODE_SLOWER),
        golden.encode_image_to_memory(a, 9, 9, 3, F.FPNG_FORCE_UNCOMPRESSED),
        b"not a png",
    ]
    sts, outs = decode_batch(pngs, 4)
    assert sts[0] == 0 and np.array_equal(outs[0][..., :3], a)
    assert sts[1] == 0 and np.array_equal(outs[1], b)
    assert sts[2] == 0 and np.array_equal(outs[2][..., :3], a)
    assert sts[3] == F.FPNG_DECODE_FAILED_NOT_PNG and outs[3] is None


def test_decode_bitflip_parity_with_golden(rng, reflib):
    """For corrupted streams, device accept/reject + pixels must match the
    golden model and the reference decoder exactly (fpng skips IDAT CRC and
    adler32 value checks, so some corruptions legitimately 'succeed')."""
    img = rng.integers(0, 200, (7, 19, 3), dtype=np.uint8)
    img[2:5] = 11
    png = bytearray(golden.encode_image_to_memory(img, 19, 7, 3, 0))
    idat_start = 58
    positions = rng.integers(idat_start * 8, (len(png) - 16) * 8, size=60)
    for bitpos in positions:
        bad = bytearray(png)
        bad[bitpos // 8] ^= 1 << (bitpos % 8)
        bad = bytes(bad)
        st_g, out_g, *_ = F.fpng_decode_memory(bad, 3)
        st_d, out_d = decode_batch([bad], 3)
        st_r, out_r, *_ = reflib.decode(bad, 3)
        assert (st_d[0] == 0) == (st_g == 0) == (st_r == 0), (
            bitpos, st_d[0], st_g, st_r)
        if st_g == 0:
            assert np.array_equal(out_d[0], out_g), bitpos
            assert np.array_equal(out_d[0], out_r), bitpos


def test_decode_truncated_and_garbage(rng):
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    png = golden.encode_image_to_memory(img, 6, 6, 3, 0)
    for cut in (10, 40, 60, len(png) - 5):
        sts, outs = decode_batch([png[:cut]], 3)
        assert sts[0] != F.FPNG_DECODE_SUCCESS
        assert outs[0] is None
    sts, outs = decode_batch([b"\x89PNG\r\n\x1a\n" + b"\0" * 100], 3)
    assert sts[0] != F.FPNG_DECODE_SUCCESS
