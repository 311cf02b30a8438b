"""Pallas walk-kernel decoder (interpret mode) vs the public encoder.

decode_kernel_tpu must reproduce pixels bit-exactly, accept every valid
stream, and reject corrupted ones, matching the XLA decode_kernel
semantics (whose parity with the reference is covered elsewhere).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops.specdec_tpu import decode_kernel_tpu, plan_tpu


def _prep(pngs):
    metas = [_parse_one(p) for p in pngs]
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
        assert lut is not None
        stream[j, :len(src)] = np.frombuffer(src, np.uint8)
        luts[j] = pack_lut(lut)
        p0[j] = p
        zl[j] = z
    return stream, luts, p0, zl, nb


def _dec(stream, luts, p0, zl, nb, shape):
    h, w, ch = shape
    return decode_kernel_tpu(
        jnp.asarray(stream), jnp.asarray(luts), jnp.asarray(p0),
        jnp.asarray(zl), h=h, w=w, c=ch, nc_pad=plan_tpu(nb),
        interpret=True)


@pytest.mark.parametrize("case", ["photo3", "flat", "rgba", "photo2p",
                                  "tiny", "wide", "wide4"])
def test_walk_kernel_roundtrip(case):
    rng = np.random.default_rng(hash(case) % 2**31)
    flags = 0
    if case == "photo3":
        imgs = (rng.normal(128, 25, (2, 48, 53, 3)).clip(0, 255)) \
            .astype(np.uint8)
        imgs[:, 10:20] = 50
    elif case == "flat":
        imgs = np.full((2, 40, 40, 3), 9, np.uint8)
    elif case == "rgba":
        imgs = (rng.normal(100, 15, (2, 32, 33, 4)).clip(0, 255)) \
            .astype(np.uint8)
        imgs[:, 8:16] = 200
    elif case == "photo2p":
        imgs = (rng.normal(128, 25, (2, 48, 53, 3)).clip(0, 255)) \
            .astype(np.uint8)
        flags = F.FPNG_ENCODE_SLOWER
    elif case == "tiny":
        # small but compressible (images below ~50 bytes of budget use
        # the stored path, which the walk kernel never sees)
        imgs = np.full((3, 16, 16, 3), 31, np.uint8)
        imgs[:, ::4] = 90
    elif case == "wide":
        imgs = np.tile(rng.integers(0, 255, (1, 1, 300, 3), np.uint8),
                       (2, 9, 1, 1)).copy()
    else:  # wide4: 4ch over the expansion kernel path (bpl >= 256)
        imgs = (rng.normal(100, 20, (2, 13, 80, 4)).clip(0, 255)) \
            .astype(np.uint8)
        imgs[:, 4:8] = 77
    pngs = F.encode_batch(imgs, flags)
    stream, luts, p0, zl, nb = _prep(pngs)
    di, ok = _dec(stream, luts, p0, zl, nb, imgs.shape[1:])
    assert np.asarray(ok).all()
    assert np.array_equal(np.asarray(di), imgs)


def test_walk_kernel_rejects_corruption():
    rng = np.random.default_rng(5)
    imgs = (rng.normal(128, 12, (2, 40, 40, 3)).clip(0, 255)) \
        .astype(np.uint8)
    pngs = F.encode_batch(imgs, 0)
    stream, luts, p0, zl, nb = _prep(pngs)
    from fpng_tpu.golden import decode_zlib

    h, w, ch = imgs.shape[1:]
    hdr_end = (int(p0[0]) + 7) // 8  # kernel reads only bits >= p0
    for pos in (30, 60, len(pngs[0]) // 3):
        bad = stream.copy()
        bad[0, pos] ^= 0xFF
        di, ok = _dec(bad, luts, p0, zl, nb, imgs.shape[1:])
        okh = np.asarray(ok)
        if pos < hdr_end:
            # header-region flips are invisible to the kernel (the LUT
            # was parsed from the pristine header; the public API path
            # re-parses and catches these): output must be unchanged
            assert okh[0]
            assert np.array_equal(np.asarray(di)[0], imgs[0])
        else:
            # differential vs the scalar golden model on the SAME
            # corrupted stream: agree on acceptance, and an accepted
            # stream must decode to the oracle's pixels (no silent
            # corruption)
            oracle = decode_zlib(bad[0].tobytes(), int(zl[0]), w, h, ch)
            assert bool(okh[0]) == (oracle is not None)
            if okh[0]:
                assert np.array_equal(np.asarray(di)[0], oracle)
        assert okh[1]  # untouched image still decodes
        assert np.array_equal(np.asarray(di)[1], imgs[1])


def test_k8_cache_decays_after_deep_batch():
    """A pathological deep batch must not inflate the record-trim bound
    for its geometry forever (VERDICT r2 weak #8)."""
    import fpng_tpu.ops.specdec_tpu as SD

    rng = np.random.default_rng(11)
    # same (h, w, c): noise compresses poorly (deep walks), flat runs
    # shallow; share nc_pad so both hit the same cache key
    # compressible but dense (stored fallback never triggers; walks deep)
    noise = rng.normal(128, 12, (1, 32, 32, 3)).clip(0, 255).astype(np.uint8)
    flat = np.full((1, 32, 32, 3), 77, np.uint8)
    flat[:, ::6] = 13
    p_noise = F.encode_batch(noise, 0)
    p_flat = F.encode_batch(flat, 0)
    sn, ln_, pn_, zn, nbn = _prep(p_noise)
    sf, lf, pf, zf, _ = _prep(p_flat)
    ncp = plan_tpu(nbn)
    key = (32, 32, 3, ncp)
    SD._K8_CACHE.pop(key, None)

    def dec(s, l, p, z):
        return decode_kernel_tpu(
            jnp.asarray(s), jnp.asarray(l), jnp.asarray(p),
            jnp.asarray(z), h=32, w=32, c=3, nc_pad=ncp, interpret=True)

    di, ok = dec(sn, ln_, pn_, zn)
    assert np.asarray(ok).all() and np.array_equal(np.asarray(di), noise)
    deep_k8 = SD._K8_CACHE[key][0]
    for _ in range(SD._K8_STALE):
        di, ok = dec(sf, lf, pf, zf)
        assert np.asarray(ok).all()
        assert np.array_equal(np.asarray(di), flat)
    assert SD._K8_CACHE[key][0] < deep_k8
    SD._K8_CACHE.pop(key, None)


def test_deep_chunk_checkerboard_roundtrip():
    """Very deep chunks (walks far past the typical record depth).

    A checkerboard defeats matching (every byte differs from its left
    neighbour) while 2-pass tables give its two delta symbols 1-2 bit
    codes, so one 512-bit chunk holds ~170 walk steps - several trim
    granules past the photo corpus's p99 (~65) - guarding the deep
    record-trim path (large k8) end to end.
    """
    from fpng_tpu import constants as C
    from fpng_tpu.ops.specdec_tpu import _decode_walk

    h = w = 64
    y, x = np.mgrid[0:h, 0:w]
    img = (((x + y) % 2)[..., None] * np.full(3, 17)).astype(np.uint8)
    imgs = np.stack([img, img])
    pngs = F.encode_batch(imgs, C.FPNG_ENCODE_SLOWER)
    stream, luts, p0, zl, nb = _prep(pngs)
    steps = np.asarray(_decode_walk(
        jnp.asarray(stream), jnp.asarray(luts), jnp.asarray(p0),
        jnp.asarray(zl), nc_pad=plan_tpu(nb), interpret=True)[6])
    assert steps.max() > 128  # the vector really is deep
    di, ok = _dec(stream, luts, p0, zl, nb, (h, w, 3))
    assert bool(np.asarray(ok).all())
    assert np.array_equal(np.asarray(di), imgs)


def test_membership_demote_roundtrip_128():
    """128px photo tiles: the fixpoint admits ~10% of lanes through the
    pair-second-token membership (measured via tools/dbg_fixpoint.py),
    whose records the finalize must DEMOTE to the second literal.  The
    64px cases rarely exercise that path; this asserts bit-exact decode
    at a size where it fires.

    Runs in a SUBPROCESS: compiling this geometry late in a long suite
    process has segfaulted the XLA:CPU compiler (accumulated in-process
    LLVM state); isolation makes it deterministic.
    """
    import os
    import subprocess
    import sys

    code = """
import numpy as np, jax.numpy as jnp
import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops.specdec_tpu import decode_kernel_tpu, plan_tpu
from fpng_tpu.train import real_corpus
tiles = list(real_corpus(3, 256))
imgs = np.stack([t[:128, :128] for t in tiles[:2]])
pngs = F.encode_batch(imgs, 0)
metas = [_parse_one(p) for p in pngs]
nb = 64
while nb < max(len(m[4]) for m in metas):
    nb *= 2
B = len(pngs)
stream = np.zeros((B, nb), np.uint8); luts = np.zeros((B, 4096), np.uint32)
p0 = np.zeros(B, np.int32); zl = np.zeros(B, np.int32)
for j, m in enumerate(metas):
    _, _, _, _, src, p, z, lut = m
    stream[j, :len(src)] = np.frombuffer(src, np.uint8)
    luts[j] = pack_lut(lut); p0[j] = p; zl[j] = z
di, ok = decode_kernel_tpu(jnp.asarray(stream), jnp.asarray(luts),
                           jnp.asarray(p0), jnp.asarray(zl),
                           h=128, w=128, c=3, nc_pad=plan_tpu(nb),
                           interpret=True)
assert bool(np.asarray(ok).all())
assert np.array_equal(np.asarray(di), imgs)
print("DEMOTE128 OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert "DEMOTE128 OK" in r.stdout, (r.stdout[-500:], r.stderr[-1500:])
