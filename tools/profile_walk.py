"""Walk-stage decomposition: pass0 alone vs full fixpoint walk.

Usage: python tools/profile_walk.py [size] [batch]
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def force1(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[-1]))


def chain(f, *a, K=10):
    r = f(*a)
    force1(r)
    t0 = time.perf_counter()
    for _ in range(K):
        r = f(*a)
    force1(r)
    return (time.perf_counter() - t0) / K


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from tools.profile_kernels import corpus

    import fpng_tpu as F
    from fpng_tpu.models.decoder import _parse_one
    from fpng_tpu.ops.specdec import pack_lut
    from fpng_tpu.ops.specdec_tpu import (LPI, S_TPU, _decode_walk,
                                          _lane_tiles, _prep_w24_tiles,
                                          plan_tpu, walk_fix_tpu)

    imgs = corpus(size, B)
    H = W = size
    Cc = 3
    mpix = B * H * W / 1e6
    print(f"corpus {B}x{size}x{size}x3 = {mpix:.1f} MPix")

    pngs = F.encode_batch(imgs, 0)
    metas = [_parse_one(p) for p in pngs]
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
    nc_pad = plan_tpu(int(zl.max()))
    sj, lj, pj, zj = map(jnp.asarray, (stream, luts, p0, zl))

    NC = nc_pad
    zl8 = (zl * 8).reshape(B, 1)
    zl8j = jnp.asarray(zl8)
    lutp4 = lj.astype(jnp.uint32).reshape(B, 4, 8, 128).astype(jnp.int32)
    ngr = NC // LPI

    @jax.jit
    def prep(stream):
        w24r, _ = _prep_w24_tiles(stream, NC, LPI)
        return w24r

    t = chain(prep, sj)
    print(f"w24 prep : {t*1e3:7.1f}ms")
    w24r = jax.device_put(prep(sj))

    kf = functools.partial(walk_fix_tpu, ng=ngr, lpi=LPI)
    t = chain(kf, w24r, lutp4, pj, zl8j)
    print(f"kernel   : {t*1e3:7.1f}ms  (walk + in-kernel fixpoint)")

    wf = functools.partial(_decode_walk, nc_pad=nc_pad)
    t = chain(wf, sj, lj, pj, zj)
    print(f"full walk: {t*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
