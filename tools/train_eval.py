"""Offline 1-pass table experiment: does adding held-out-style classes
(radial gradients etc.) to the training corpus close the per-class size
gap vs the reference (BENCH size_gate: radial_gradients 1.16, texture
1.01-1.04) without breaking the authoritative +-1% real-tile gate?

CPU-only (host golden encoder; sizes are token-exact with the device
path).  Usage: python tools/train_eval.py [candidate]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import fpng_tpu.tables as T
from fpng_tpu.train import (synthetic_corpus, real_corpus,
                            train_tables_from_images)
from fpng_tpu.golden import encode_zlib

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from ref_oracle import RefOracle, _build_ref_shim

REF = RefOracle(_build_ref_shim())


def radial_class(ch, rng, h=192, w=192, n=8):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for _ in range(n):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        rgb = np.stack([(r * s) % 256 for s in rng.uniform(0.4, 3.5, 3)],
                       axis=-1).astype(np.uint8)
        if ch == 4:
            a = np.minimum(rgb[..., 1].astype(np.int32) + 96, 255) \
                .astype(np.uint8)
            rgb = np.concatenate([rgb, a[..., None]], axis=-1)
        out.append(rgb)
    return out


def candidate_corpus(ch):
    imgs = list(synthetic_corpus(ch)) + list(real_corpus(ch))
    # training-side radial gradients: seed disjoint from the bench's
    # held-out class (0xBEEF+ch there)
    rng = np.random.default_rng(0x51AD + ch)
    imgs += radial_class(ch, rng)
    return imgs


def heldout(ch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m._heldout_classes(ch)


def size_ratio(imgs, ch):
    ours = theirs = 0
    for img in imgs:
        ours += len(encode_zlib(img, 0)[0])
        theirs += len(REF.encode(np.asarray(img), 0))
    return ours / theirs


def real_gate(ch):
    tiles = list(real_corpus(ch, 128))
    ours = theirs = 0
    for t in tiles:
        ours += len(encode_zlib(t, 0)[0])
        theirs += len(REF.encode(t, 0))
    return ours / theirs


def main():
    for ch in (3, 4):
        print(f"=== {ch}ch ===")
        held = heldout(ch)
        for label, corpus in (("current", None),
                              ("candidate", candidate_corpus(ch))):
            T._CACHE.pop(ch, None)
            if corpus is not None:
                T._CACHE[ch] = train_tables_from_images(corpus, ch)
            gates = {k: round(size_ratio(list(v), ch), 4)
                     for k, v in held.items()}
            print(f"  {label:9s}: real128_gate={real_gate(ch):.4f} "
                  f"held-out={gates}")
        T._CACHE.pop(ch, None)


if __name__ == "__main__":
    main()
