"""Device (batched XLA) encoder vs golden model: byte-exact in every mode."""

import numpy as np
import pytest

import fpng_tpu as F
from fpng_tpu import golden
from fpng_tpu.models.encoder import encode_batch


@pytest.mark.parametrize("flags", [0, F.FPNG_ENCODE_SLOWER,
                                   F.FPNG_FORCE_UNCOMPRESSED])
@pytest.mark.parametrize("shape", [(13, 17, 3), (8, 8, 4), (33, 70, 3),
                                   (64, 64, 4), (1, 1, 3), (2, 300, 4),
                                   (200, 3, 3), (5, 86, 3), (5, 64, 4)])
def test_device_matches_golden(rng, shape, flags):
    h, w, c = shape
    B = 3
    imgs = np.stack([
        _mk(rng, h, w, c, i) for i in range(B)
    ])
    outs = encode_batch(imgs, flags)
    for b in range(B):
        want = golden.encode_image_to_memory(imgs[b], w, h, c, flags)
        assert outs[b] == want, (shape, flags, b)


def _mk(rng, h, w, c, i):
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    if i == 0 and h >= 2:  # flat-ish: exercises long runs + cost check
        img[:] = img[0, 0]
        if w >= 3:
            img[:, w // 2] = rng.integers(0, 256, c, dtype=np.uint8)
    elif i == 1 and h >= 4 and w >= 4:
        img[h // 4:h // 2] = rng.integers(0, 256, c, dtype=np.uint8)
    return img


def test_device_long_runs_exact(rng):
    """Cap-splitting across 85/63-pixel boundaries, batch of widths."""
    for c, w in ((3, 256), (4, 200)):
        img = np.zeros((4, w, c), np.uint8)
        img[1, :] = 7
        img[2, ::97] = 3
        imgs = img[None]
        for flags in (0, F.FPNG_ENCODE_SLOWER):
            out = encode_batch(imgs, flags)[0]
            want = golden.encode_image_to_memory(img, w, 4, c, flags)
            assert out == want, (c, w, flags)


def test_device_outputs_decode(rng, reflib):
    imgs = np.stack([_mk(rng, 24, 31, 4, i) for i in range(2)])
    for flags in (0, F.FPNG_ENCODE_SLOWER):
        for png, img in zip(encode_batch(imgs, flags), imgs):
            st, out, *_ = reflib.decode(png, 4)
            assert st == 0 and np.array_equal(out, img)
            st, out, *_ = F.fpng_decode_memory(png, 4)
            assert st == 0 and np.array_equal(out, img)
