"""Device checksum reduction kernels vs zlib."""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpng_tpu.ops.checksum import adler32_bytes, crc32_bytes


@pytest.mark.parametrize("n", [1, 7, 255, 256, 257, 1023, 1024, 1025,
                               5552, 5553, 70001])
def test_adler32_matches_zlib(rng, n):
    d = rng.integers(0, 256, (3, n), dtype=np.uint8)
    got = np.asarray(jax.jit(adler32_bytes)(jnp.asarray(d)))
    for b in range(3):
        assert got[b] == zlib.adler32(d[b].tobytes()), (n, b)


@pytest.mark.parametrize("n", [1, 7, 255, 256, 257, 1024, 4096, 70001])
def test_crc32_matches_zlib(rng, n):
    d = rng.integers(0, 256, (3, n), dtype=np.uint8)
    got = np.asarray(jax.jit(crc32_bytes)(jnp.asarray(d)))
    for b in range(3):
        assert got[b] == zlib.crc32(d[b].tobytes()), (n, b)


def test_adler32_zeros_and_ones():
    for n in (1, 1024, 5000):
        for v in (0, 255):
            d = np.full((1, n), v, np.uint8)
            got = int(np.asarray(jax.jit(adler32_bytes)(jnp.asarray(d)))[0])
            assert got == zlib.adler32(d[0].tobytes())
