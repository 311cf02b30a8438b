"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures batched 1-pass encode + decode throughput over a deterministic
synthetic corpus with realistic PNG statistics (flat/gradient/photo/noise
mix, the same classes as the training corpus), as megapixels/second per
chip, best-of-3 like the reference harness (fpng_test.cpp:1181).

vs_baseline compares against the reference's single-core aggregate on its
headline corpus: 110.16 MPix/s encode, 162.01 MPix/s decode
(BASELINE.md) => harmonic aggregate 1 / (1/110.16 + 1/162.01).
"""

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: TPU compiles (remote-compile tunnel)
# dominate cold runs; cache them across bench invocations.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

BASE_ENCODE = 110.16  # MPix/s, reference 1-pass encode (BASELINE.md)
BASE_DECODE = 162.01  # MPix/s, reference 1-pass decode


def make_corpus(B=16, H=512, W=512, C=3):
    from fpng_tpu.train import synthetic_corpus

    gen = synthetic_corpus(C, size=H)
    imgs = []
    while len(imgs) < B:
        for img in synthetic_corpus(C, size=H):
            imgs.append(np.ascontiguousarray(img[:H, :W]))
            if len(imgs) == B:
                break
    return np.stack(imgs)


def main():
    import fpng_tpu as F

    imgs = make_corpus()
    B, H, W, C = imgs.shape
    mpix = B * H * W / 1e6

    # -- encode --
    pngs = F.encode_batch(imgs, 0)  # warmup/compile
    enc_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        pngs = F.encode_batch(imgs, 0)
        enc_times.append(time.perf_counter() - t0)
    enc_mps = mpix / min(enc_times)

    # -- decode --
    dec_mps = None
    try:
        from fpng_tpu.models import decoder as _dec_mod

        if not getattr(_dec_mod, "BENCH_READY", False):
            raise ImportError("device decoder not bench-ready yet")
        dec = _dec_mod.decode_batch

        st, outs = dec(pngs, C)  # warmup
        dec_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            st, outs = dec(pngs, C)
            dec_times.append(time.perf_counter() - t0)
        ok = all(np.array_equal(o, i) for o, i in zip(outs, imgs))
        if not ok:
            raise RuntimeError("decode mismatch")
        dec_mps = mpix / min(dec_times)
    except (ImportError, AttributeError):
        pass  # decoder not on device yet: report encode-only

    if dec_mps is not None:
        agg = 1.0 / (1.0 / enc_mps + 1.0 / dec_mps)
        base = 1.0 / (1.0 / BASE_ENCODE + 1.0 / BASE_DECODE)
        print(json.dumps({
            "metric": "fpng 1-pass encode+decode aggregate throughput",
            "value": round(agg, 2),
            "unit": "MPix/s",
            "vs_baseline": round(agg / base, 3),
            "detail": {"encode_mps": round(enc_mps, 2),
                       "decode_mps": round(dec_mps, 2),
                       "corpus": f"{B}x{H}x{W}x{C}"},
        }))
    else:
        print(json.dumps({
            "metric": "fpng 1-pass encode throughput",
            "value": round(enc_mps, 2),
            "unit": "MPix/s",
            "vs_baseline": round(enc_mps / BASE_ENCODE, 3),
            "detail": {"corpus": f"{B}x{H}x{W}x{C}"},
        }))


if __name__ == "__main__":
    main()
