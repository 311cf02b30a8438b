"""PK=8 packed-lane walk kernel (ops/walk8.py) in interpret mode.

Covers: roundtrip equality vs the encoder across both table modes,
cross-chunk entry correction (multi-group streams), the overflow
fallback signal on sub-2-bit/token streams, and agreement with the
PK=1 kernel on identical inputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops import walk8 as W8


def _prep(pngs):
    metas = [_parse_one(p) for p in pngs]
    assert all(m[7] is not None for m in metas), [m[0] for m in metas]
    B = len(pngs)
    nb = 64
    while nb < max(len(m[4]) for m in metas):
        nb *= 2
    stream = np.zeros((B, nb), np.uint8)
    luts = np.zeros((B, 4096), np.uint32)
    p0 = np.zeros(B, np.int32)
    zl = np.zeros(B, np.int32)
    for j, m in enumerate(metas):
        _, _, _, _, src, p, z, lut = m
        stream[j, :len(src)] = np.frombuffer(src, np.uint8)
        luts[j] = pack_lut(lut)
        p0[j] = p
        zl[j] = z
    return (jnp.asarray(stream), jnp.asarray(luts), jnp.asarray(p0),
            jnp.asarray(zl), int(zl.max()))


def _corpus(c, size=48, n=2):
    from fpng_tpu.train import real_corpus

    tiles = list(real_corpus(c, size))
    return np.stack((tiles * n)[:n])


@pytest.mark.parametrize("flags", [0, F.FPNG_ENCODE_SLOWER])
@pytest.mark.parametrize("c", [3, 4])
def test_walk8_roundtrip(c, flags):
    imgs = _corpus(c)
    B, H, W, _ = imgs.shape
    pngs = F.encode_batch(imgs, flags)
    sj, lj, pj, zj, zmax = _prep(pngs)
    nc_pad, lpi = W8.plan_tpu8(zmax, 8)
    out = W8.decode_kernel8_tpu(sj, lj, pj, zj, h=H, w=W, c=c,
                                nc_pad=nc_pad, lpi=lpi,
                                zlib_len_max=zmax, interpret=True)
    assert out is not None
    di, ok = out
    assert bool(np.asarray(ok).all())
    assert np.array_equal(np.asarray(di), imgs)


def test_walk8_multigroup_entry_chain():
    """A stream long enough to span several walk8 groups exercises the
    cross-group SMEM carry and the in-group set/lane entry roll."""
    rng = np.random.default_rng(7)
    # mildly noisy gradient: compresses enough to stay dynamic, badly
    # enough to spread over many 512-bit chunks
    base = (np.arange(96)[None, :, None, None] +
            np.arange(96)[None, None, :, None]).astype(np.uint8)
    imgs = (base + rng.integers(0, 5, (1, 96, 96, 3))).astype(np.uint8)
    pngs = F.encode_batch(imgs, 0)
    sj, lj, pj, zj, zmax = _prep(pngs)
    nc_pad, lpi = W8.plan_tpu8(zmax, 8)
    assert nc_pad > 8 * lpi  # must span several walk8 groups
    out = W8.decode_kernel8_tpu(sj, lj, pj, zj, h=96, w=96, c=3,
                                nc_pad=nc_pad, lpi=lpi,
                                zlib_len_max=zmax, interpret=True)
    assert out is not None
    di, ok = out
    assert bool(np.asarray(ok).all())
    assert np.array_equal(np.asarray(di), imgs)


def test_walk8_overflow_falls_back():
    """2-pass noise over a binary alphabet codes ~1-2 bits/token: more
    than 8*maxit tokens per 512-bit chunk, so walk8 must report
    overflow (None) instead of silently truncating - the decoder
    driver then takes the PK=1 kernel."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 2, (1, 32, 32, 3)).astype(np.uint8)
    imgs = np.cumsum(imgs, axis=1).astype(np.uint8)  # Up-filter noise
    pngs = F.encode_batch(imgs, F.FPNG_ENCODE_SLOWER)
    sj, lj, pj, zj, zmax = _prep(pngs)
    nc_pad, lpi = W8.plan_tpu8(zmax, 8)
    out = W8.decode_kernel8_tpu(sj, lj, pj, zj, h=32, w=32, c=3,
                                nc_pad=nc_pad, lpi=lpi, maxit=2,
                                zlib_len_max=zmax, interpret=True)
    assert out is None  # 16-step capacity certainly overflows


def test_walk8_matches_pk1():
    imgs = _corpus(3, size=64, n=1)
    pngs = F.encode_batch(imgs, 0)
    sj, lj, pj, zj, zmax = _prep(pngs)
    from fpng_tpu.ops.specdec_tpu import decode_kernel_tpu, plan_tpu

    d1, ok1 = decode_kernel_tpu(sj, lj, pj, zj, h=64, w=64, c=3,
                                nc_pad=plan_tpu(zmax),
                                zlib_len_max=zmax, interpret=True)
    nc_pad, lpi = W8.plan_tpu8(zmax, 8)
    out = W8.decode_kernel8_tpu(sj, lj, pj, zj, h=64, w=64, c=3,
                                nc_pad=nc_pad, lpi=lpi,
                                zlib_len_max=zmax, interpret=True)
    assert out is not None
    d8, ok8 = out
    assert bool(np.asarray(ok1).all()) == bool(np.asarray(ok8).all())
    assert np.array_equal(np.asarray(d1), np.asarray(d8))
