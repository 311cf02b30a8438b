"""A/B the PK=8 packed-lane walk (ops/walk8.py) vs the PK=1 walk on
the attached device.

Usage: python tools/prof_walk8.py [size] [batch] [lpi]
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

from tools.profile_kernels import chain, corpus  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    lpi_arg = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    import fpng_tpu as F
    from fpng_tpu.models.decoder import _parse_one
    from fpng_tpu.ops.specdec import pack_lut
    from fpng_tpu.ops.specdec_tpu import decode_kernel_tpu, plan_tpu
    from fpng_tpu.ops import walk8 as W8

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
    sj, lj, pj, zj = map(jnp.asarray, (stream, luts, p0, zl))
    zmax = int(zl.max())

    # --- PK=1 reference ---
    nc_pad1 = plan_tpu(zmax)
    all1 = functools.partial(decode_kernel_tpu, h=H, w=W, c=Cc,
                             nc_pad=nc_pad1, zlib_len_max=zmax)
    di, ok = all1(sj, lj, pj, zj)
    assert bool(np.asarray(ok).all())
    assert np.array_equal(np.asarray(di), imgs)
    t = chain(all1, sj, lj, pj, zj)
    print(f"pk1 all  : {t*1e3:7.1f}ms  {mpix/t:7.0f} MP/s  (nc={nc_pad1})")
    w1 = functools.partial(
        __import__("fpng_tpu.ops.specdec_tpu", fromlist=["x"])._decode_walk,
        nc_pad=nc_pad1)
    t = chain(w1, sj, lj, pj, zj)
    print(f"pk1 walk : {t*1e3:7.1f}ms")

    # --- PK=8 ---
    nc_pad8, lpi = W8.plan_tpu8(zmax, lpi_arg or None)
    print(f"walk8: nc_pad={nc_pad8} lpi={lpi} maxit={W8.MAXIT}")
    all8 = functools.partial(W8.decode_kernel8_tpu, h=H, w=W, c=Cc,
                             nc_pad=nc_pad8, lpi=lpi, zlib_len_max=zmax)
    out = all8(sj, lj, pj, zj)
    assert out is not None, "walk8 overflow on this corpus?!"
    di8, ok8 = out
    assert bool(np.asarray(ok8).all())
    assert np.array_equal(np.asarray(di8), imgs), "walk8 mismatch"
    t = chain(all8, sj, lj, pj, zj)
    print(f"pk8 all  : {t*1e3:7.1f}ms  {mpix/t:7.0f} MP/s")
    ncl = min(-(-max(-(-zmax * 8 // W8.S_TPU), 1) // (8 * lpi)) * 8 * lpi,
              nc_pad8)
    w8f = functools.partial(W8._decode_walk8, nc_pad=nc_pad8, lpi=lpi,
                            maxit=W8.MAXIT, ncg_live=ncl // (8 * lpi))
    t = chain(w8f, sj, lj, pj, zj)
    print(f"pk8 walk : {t*1e3:7.1f}ms")
    wout = w8f(sj, lj, pj, zj)
    wargs = [jax.device_put(a) for a in wout[:6]]
    k8 = W8._K8_CACHE8[(H, W, Cc, nc_pad8, lpi)][0]
    finf = functools.partial(W8._decode_finish8, h=H, w=W, c=Cc,
                             nc_pad=nc_pad8, lpi=lpi, k8=k8, ncl=ncl)
    t = chain(finf, *wargs, zj)
    print(f"pk8 fin  : {t*1e3:7.1f}ms  (k8={k8})")

    if os.environ.get("FPNG_TPU_PROF_STAGES", ""):
        # sub-split of fin: finalize kernel / deposit / expand
        from fpng_tpu.ops.specdec_tpu import _bpl_pad, expand_tpu
        from fpng_tpu.ops.bitpack import scatter_packed16_tpu
        row_stride = 1 + W * Cc
        geom = (row_stride, H * row_stride, Cc, _bpl_pad(W * Cc))
        NCl = ncl
        fzf = jax.jit(functools.partial(
            W8._finalize_records8, k8=k8, geom=geom, lpi=lpi,
            ncg=NCl // (8 * lpi)))
        t = chain(fzf, *wargs)
        print(f"  finalize: {t*1e3:7.1f}ms")
        meta7, metb7, _ = fzf(*wargs)
        n_rec = NCl * k8
        meta = jax.device_put(meta7.reshape(B, n_rec))
        metb = jax.device_put(metb7.reshape(B, n_rec))
        bpl_pad = _bpl_pad(W * Cc)
        dep_words = (-(-H // 8) * 8) * (bpl_pad // 2)
        depf = jax.jit(functools.partial(scatter_packed16_tpu,
                                         num_words=dep_words))
        t = chain(lambda m, mb: depf(m, metb=mb), meta, metb)
        print(f"  deposit : {t*1e3:7.1f}ms  N={n_rec}/img")
        dep = jax.device_put(depf(meta, metb=metb))
        expf = jax.jit(functools.partial(
            expand_tpu, h=H, w=W, c=Cc, bpl_pad=bpl_pad))
        t = chain(lambda d: expf(jax.lax.bitcast_convert_type(d, jnp.int32)),
                  dep)
        print(f"  expand  : {t*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
