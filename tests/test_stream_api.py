"""Pipelined serving APIs: encode_batch_stream / decode_batch_stream
must produce byte-identical results to per-batch encode/decode calls."""

import numpy as np

import fpng_tpu as F
from fpng_tpu import constants as C


def _batches(rng, n=3, B=2, h=24, w=31, c=3, flags_mix=False):
    out = []
    for k in range(n):
        img = rng.normal(120 + 10 * k, 14, (B, h, w, c)) \
            .clip(0, 255).astype(np.uint8)
        img[:, 5:9] = 40 + k  # flat band => matches
        out.append(img)
    return out


def test_encode_stream_matches_batch_1pass():
    rng = np.random.default_rng(21)
    batches = _batches(rng)
    got = list(F.encode_batch_stream(iter(batches), 0))
    want = [F.encode_batch(b, 0) for b in batches]
    assert got == want


def test_encode_stream_matches_batch_2pass():
    rng = np.random.default_rng(22)
    batches = _batches(rng)
    got = list(F.encode_batch_stream(iter(batches), C.FPNG_ENCODE_SLOWER))
    want = [F.encode_batch(b, C.FPNG_ENCODE_SLOWER) for b in batches]
    assert got == want


def test_encode_stream_stored():
    rng = np.random.default_rng(23)
    batches = _batches(rng, n=2)
    got = list(F.encode_batch_stream(iter(batches),
                                     C.FPNG_FORCE_UNCOMPRESSED))
    want = [F.encode_batch(b, C.FPNG_FORCE_UNCOMPRESSED) for b in batches]
    assert got == want


def test_decode_stream_roundtrip():
    rng = np.random.default_rng(24)
    batches = _batches(rng)
    pngs = [F.encode_batch(b, 0) for b in batches]
    # corrupt one file in the middle batch: per-file status must localize
    pngs[1][0] = pngs[1][0][:40] + b"\xff" + pngs[1][0][41:]
    results = list(F.decode_batch_stream(iter(pngs), 3))
    assert len(results) == len(batches)
    for k, (sts, outs) in enumerate(results):
        want_sts, want_outs = F.decode_batch(pngs[k], 3)
        assert sts == want_sts
        for o, wo in zip(outs, want_outs):
            assert (o is None) == (wo is None)
            if o is not None:
                assert np.array_equal(o, wo)
    sts1, _ = results[1]
    assert sts1[0] != C.FPNG_DECODE_SUCCESS
    assert sts1[1] == C.FPNG_DECODE_SUCCESS


def test_stream_empty_and_single():
    assert list(F.encode_batch_stream(iter([]), 0)) == []
    rng = np.random.default_rng(25)
    b = _batches(rng, n=1)[0]
    got = list(F.encode_batch_stream(iter([b]), 0))
    assert got == [F.encode_batch(b, 0)]
