"""Device container assembly (ops/assemble.py) vs the host assembler.

The arena path must be byte-identical to container.build_png around the
same deflate payloads — including prefix splice, variable-offset adler,
IDAT CRC-32 and IEND (fpng.cpp:1766-1800 semantics).
"""

import numpy as np
import pytest

import fpng_tpu as F
from fpng_tpu import constants as C
from fpng_tpu.container import build_png


def _rand_imgs(rng, B, H, W, Cc):
    base = rng.integers(0, 256, (B, H, W, Cc), np.uint8)
    # inject RLE runs so streams have matches too
    base[:, :, W // 3:2 * W // 3] = base[:, :, W // 3:W // 3 + 1]
    return base


@pytest.mark.parametrize("Cc", [3, 4])
@pytest.mark.parametrize("flags", [0, C.FPNG_ENCODE_SLOWER])
def test_arena_matches_host_assembly(monkeypatch, Cc, flags):
    rng = np.random.default_rng(7 * Cc + flags)
    imgs = _rand_imgs(rng, 3, 24, 37, Cc)

    monkeypatch.setenv("FPNG_TPU_HOST_ASSEMBLY", "1")
    host = F.encode_batch(imgs, flags)
    monkeypatch.setenv("FPNG_TPU_HOST_ASSEMBLY", "0")
    dev = F.encode_batch(imgs, flags)
    for b, (ph, pd) in enumerate(zip(host, dev)):
        assert ph == pd, f"image {b}: arena PNG != host PNG"


def test_arena_roundtrip_decodes():
    rng = np.random.default_rng(11)
    imgs = _rand_imgs(rng, 2, 16, 19, 3)
    pngs = F.encode_batch(imgs, 0)
    sts, outs = F.decode_batch(pngs, 3)
    assert all(s == C.FPNG_DECODE_SUCCESS for s in sts)
    assert all(np.array_equal(o, i) for o, i in zip(outs, imgs))


def test_devcrc_assembly_equals_build_png_directly():
    """Drive launch_assemble + _finish_batch_devcrc on a synthetic payload
    spanning the edge cases: payloads reaching every chunk-boundary phase,
    the exact buffer edge, and per-image (non-shared) prefixes."""
    import jax.numpy as jnp

    from fpng_tpu.models.encoder import _finish_batch_devcrc, launch_assemble

    rng = np.random.default_rng(3)
    B, W, H, Cc = 6, 9, 7, 3
    NW = 1024  # one CRC chunk: minimum legal word buffer
    words = rng.integers(0, 2**32, (B, NW), np.uint64).astype(np.uint32)
    prefixes = [bytes(rng.integers(0, 256, rng.integers(5, 60),
                                   np.uint8).tolist())
                for _ in range(B)]
    # All >= 60 so prefixes fit inside the payload (true of real streams:
    # total_bits covers the prefix); include the absolute buffer edge.
    tbytes = np.array([61, 200, NW * 4 - 20, 100, NW * 4 - 18, NW * 4],
                      np.int64)
    adler = rng.integers(0, 2**32, B, np.uint64).astype(np.uint32)
    total_bits = tbytes * 8
    crc = launch_assemble(jnp.asarray(words), jnp.asarray(total_bits),
                          jnp.asarray(adler), prefixes)
    imgs = np.zeros((B, H, W, Cc), np.uint8)
    budget = NW * 4  # all payloads pass the fallback predicate except edge
    last_tok = np.full(B, -1, np.int64)
    pngs = _finish_batch_devcrc(imgs, words, crc, total_bits, last_tok,
                                adler, prefixes, budget)
    for b in range(B):
        raw = bytearray(words[b].tobytes()[:tbytes[b]])
        raw[:len(prefixes[b])] = prefixes[b]
        z = bytes(raw) + int(adler[b]).to_bytes(4, "big")
        if tbytes[b] + 4 > budget:  # stored-fallback row: predicate fires
            continue
        exp = build_png(z, W, H, Cc)
        assert pngs[b] == exp, f"image {b}"


def test_devcrc_multi_chunk_tree():
    """Payloads spanning several 4096-byte CRC chunks exercise the
    log-depth register tree + the variable unshift across chunks."""
    import jax.numpy as jnp
    import zlib

    from fpng_tpu.ops.assemble import idat_crc_words, raw_idat_prefix

    rng = np.random.default_rng(5)
    B, NW = 3, 5 * 1024  # 5 chunks (odd count hits the zero-pad branch)
    words = rng.integers(0, 2**32, (B, NW), np.uint64).astype(np.uint32)
    prefixes = [b"\x78\x01" + bytes(rng.integers(0, 256, 40,
                                                 np.uint8).tolist())
                for _ in range(B)]
    tbytes = np.array([4097, 3 * 4096 + 1333, NW * 4], np.int64)
    adler = rng.integers(0, 2**32, B, np.uint64).astype(np.uint32)
    crc = np.asarray(idat_crc_words(
        jnp.asarray(words), jnp.asarray(tbytes * 8), jnp.asarray(adler),
        jnp.asarray([len(p) for p in prefixes], np.int32),
        jnp.asarray(raw_idat_prefix(prefixes)), interpret=True))
    for b in range(B):
        raw = bytearray(words[b].tobytes()[:tbytes[b]])
        raw[:len(prefixes[b])] = prefixes[b]
        msg = b"IDAT" + bytes(raw) + int(adler[b]).to_bytes(4, "big")
        assert int(crc[b]) == (zlib.crc32(msg) & 0xFFFFFFFF), f"image {b}"
