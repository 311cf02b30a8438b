"""Large-raster (>= 2^23 padded bytes) fast-decode path.

The packed deposit record's slot field is 23 bits; rasters past it use
the WIDE record format (bare slot in plane A, both values pre-shifted
in plane B - ops/bitpack.scatter_packed16_tpu wide=True) and, past the
VMEM budget, the HBM-output deposit mode (aliased zero fill + staged
window DMAs).  This lifts the walk-path reach from 2^23 to 2^27 slots
(~44 MPix at 3ch), covering the 4K/8K frames the reference fast-decodes
(fpng.cpp:2969-2971).

Covers: the wide+HBM deposit against a scalar slot model at real >2^23
offsets, and an interpret-mode 4K (3840x2160x3) encode->decode
roundtrip through the walk kernels (gradient content keeps the token
stream small so the walk stays CI-sized while the deposit/expand run at
full 24.9MB raster scale).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops.bitpack import scatter_packed16_tpu


def test_wide_hbm_deposit_matches_model():
    """Wide records at offsets past 2^23, HBM-output mode forced."""
    rng = np.random.default_rng(11)
    B, N = 2, 4096
    # monotone EVEN slots (each 32-bit deposit covers slots 2k, 2k+1:
    # a second literal rides the high half - records never overlap):
    # a dense run near zero, a jump past the 23-bit boundary (exercises
    # the gap-window fast-forward), then a dense run of high offsets
    hi0 = (1 << 23) + 64
    base = np.cumsum(rng.integers(1, 4, (B, N // 2)), axis=1) * 2
    high = hi0 + np.cumsum(rng.integers(1, 4, (B, N // 2)), axis=1) * 2
    slots = np.concatenate([base, high], axis=1).astype(np.int32)
    v1 = rng.integers(0, 256, (B, N)).astype(np.int32)
    v2 = rng.integers(0, 256, (B, N)).astype(np.int32)
    has1 = rng.random((B, N)) < 0.7
    has2 = has1 & (rng.random((B, N)) < 0.4)
    metb = np.where(has1, (v1 | 0x100) | np.where(has2,
                                                  (v2 | 0x100) << 16, 0), 0)

    num_words = ((hi0 + 3 * N + 64) * 16 + 31) // 32 + 8
    num_words = -(-num_words // 128) * 128
    import os
    os.environ["FPNG_TPU_DEP_HBM"] = "1"
    try:
        out = np.asarray(scatter_packed16_tpu(
            jnp.asarray(slots), num_words, metb=jnp.asarray(metb),
            interpret=True, wide=True))
    finally:
        del os.environ["FPNG_TPU_DEP_HBM"]

    exp = np.zeros((B, num_words), np.uint32)
    for b in range(B):
        for j in range(N):
            if metb[b, j] == 0:
                continue
            bit = int(slots[b, j]) * 16
            w, sh = bit // 32, bit % 32
            val = np.uint64(metb[b, j] & 0x01FF01FF)
            cur = (np.uint64(exp[b, w]) |
                   (np.uint64(exp[b, w + 1]) << np.uint64(32)))
            cur |= val << np.uint64(sh)
            exp[b, w] = np.uint32(cur & np.uint64(0xFFFFFFFF))
            exp[b, w + 1] = np.uint32(cur >> np.uint64(32))
    assert np.array_equal(out, exp)


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


def _gradient_4k():
    """3840x2160x3 vertical gradient: up-filter deltas are ~all zeros,
    so the token stream stays tiny while the raster is full 4K."""
    h, w = 2160, 3840
    row = (np.arange(h, dtype=np.int32) * 255 // (h - 1)).astype(np.uint8)
    img = np.broadcast_to(row[:, None, None], (h, w, 3)).copy()
    return img[None]


@pytest.mark.parametrize("kernel", ["walk8", "pk1"])
def test_4k_roundtrip_interpret(kernel):
    imgs = _gradient_4k()
    B, H, W, C = imgs.shape
    assert H * W * C > (1 << 23)  # past the old fast-path cap
    pngs = F.encode_batch(imgs, 0)
    sj, lj, pj, zj, zmax = _prep(pngs)
    if kernel == "walk8":
        from fpng_tpu.ops import walk8 as W8

        nc_pad, lpi = W8.plan_tpu8(zmax)
        out = W8.decode_kernel8_tpu(sj, lj, pj, zj, h=H, w=W, c=C,
                                    nc_pad=nc_pad, lpi=lpi,
                                    zlib_len_max=zmax, interpret=True)
        assert out is not None
    else:
        from fpng_tpu.ops.specdec_tpu import decode_kernel_tpu, plan_tpu

        out = decode_kernel_tpu(sj, lj, pj, zj, h=H, w=W, c=C,
                                nc_pad=plan_tpu(zmax), zlib_len_max=zmax,
                                interpret=True)
    di, ok = out
    assert bool(np.asarray(ok).all())
    assert np.array_equal(np.asarray(di), imgs)
