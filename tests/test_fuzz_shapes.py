"""Pathological-shape roundtrips: the -E fuzzer's corner cases in CI.

The reference's -E fuzzer draws dims 1..8193 (fpng_test.cpp:621-626);
full-length runs live in the CLI (`-E -n 1000`).  These tests pin the
shapes where budget/bucket/overflow logic breaks - extreme aspect
ratios, dim 1, and the stored-fallback boundary - through the public
batched API on every CI run.
"""

import numpy as np
import pytest

import fpng_tpu as F
from fpng_tpu import constants as C

SHAPES = [
    (1, 1), (1, 8193), (8193, 1), (2, 4097), (4096, 2), (3, 2731),
    (1, 257), (513, 1),
]


@pytest.mark.parametrize("h,w", SHAPES)
def test_extreme_shape_roundtrip(rng, h, w):
    ch = 3 if (h + w) % 2 else 4
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    # half the area compressible so both stored and dynamic paths occur
    img[: max(1, h // 2)] = img[0, 0]
    for flags in (0, C.FPNG_ENCODE_SLOWER):
        png = F.encode_batch(img[None], flags)[0]
        sts, outs = F.decode_batch([png], ch)
        assert sts[0] == C.FPNG_DECODE_SUCCESS, (h, w, flags)
        assert np.array_equal(outs[0], img), (h, w, flags)


def test_extreme_shape_stored(rng):
    img = rng.integers(0, 256, (1, 8193, 3), dtype=np.uint8)
    png = F.encode_batch(img[None], C.FPNG_FORCE_UNCOMPRESSED)[0]
    sts, outs = F.decode_batch([png], 3)
    assert sts[0] == C.FPNG_DECODE_SUCCESS
    assert np.array_equal(outs[0], img)


def test_cli_fuzz_corners_quick():
    """Drive the CLI fuzzer itself for its pinned corner trials."""
    from fpng_tpu.cli import fuzz_encoder_random

    assert fuzz_encoder_random(trials=3, max_dim=1025) == 0
