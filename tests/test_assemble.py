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


def test_arena_equals_build_png_directly():
    """Drive launch_arena directly on a synthetic payload."""
    import jax.numpy as jnp

    from fpng_tpu.models.encoder import launch_arena

    rng = np.random.default_rng(3)
    B, W, H, Cc = 6, 9, 7, 3
    NW = 64
    words = rng.integers(0, 2**32, (B, NW), np.uint64).astype(np.uint32)
    prefixes = [bytes(rng.integers(0, 256, rng.integers(5, 60), np.uint8).tolist())
                for _ in range(B)]
    # NW*4-18 = budget-4 is the real encoder's max payload (regression:
    # the 20-byte tail used to clip 2 bytes off IEND there); NW*4 is the
    # absolute arena edge.  All >= 60 so prefixes fit inside the payload
    # (true of real streams: total_bits covers the prefix).
    tbytes = np.array([61, 200, NW * 4 - 20, 100, NW * 4 - 18, NW * 4],
                      np.int64)
    adler = rng.integers(0, 2**32, B, np.uint64).astype(np.uint32)
    # zero the partial high bits like the encode kernel guarantees
    total_bits = tbytes * 8
    arena, lens = launch_arena(jnp.asarray(words), jnp.asarray(total_bits),
                               jnp.asarray(adler), prefixes, W, H, Cc)
    arena, lens = np.asarray(arena), np.asarray(lens)
    for b in range(B):
        raw = bytearray(words[b].tobytes()[:tbytes[b]])
        raw[:len(prefixes[b])] = prefixes[b]
        z = bytes(raw) + int(adler[b]).to_bytes(4, "big")
        exp = build_png(z, W, H, Cc)
        assert lens[b] == len(exp)
        assert arena[b, :lens[b]].tobytes() == exp, f"image {b}"
