"""Per-stage kernel profiler (encode + decode) on the attached device.

Chained-call timing (K launches, one forced readback) measures steady-
state device throughput, excluding the dispatch-latency artifact of
remote-tunnel rigs.  For a full device trace use FPNG_TPU_PROFILE=<dir>
with bench.py (jax.profiler integration, SURVEY §5.1).

Usage: python tools/profile_kernels.py [size] [batch]
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


def corpus(size, B):
    from fpng_tpu.train import real_corpus

    tiles = list(real_corpus(3, min(size, 256)))
    reps = -(-B // len(tiles))
    imgs = np.stack((tiles * reps)[:B])
    while imgs.shape[1] < size:
        imgs = np.tile(imgs, (1, 2, 2, 1))
    return imgs[:, :size, :size]


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import fpng_tpu as F
    from fpng_tpu.models.decoder import _parse_one
    from fpng_tpu.models.encoder import _budget, build_desc, encode_kernel
    from fpng_tpu.ops.encfuse import encode_bits_fused
    from fpng_tpu.ops.specdec import pack_lut
    from fpng_tpu.ops.specdec_tpu import (_decode_walk, decode_kernel_tpu,
                                          plan_tpu)
    from fpng_tpu.tables import get_one_pass_tables

    imgs = corpus(size, B)
    H = W = size
    Cc = 3
    mpix = B * H * W / 1e6
    print(f"corpus {B}x{size}x{size}x3 = {mpix:.1f} MPix")

    # ---- encode ----
    prefix, acc, nacc, codes1, sizes1 = get_one_pass_tables(Cc)
    codes = jnp.asarray(np.broadcast_to(codes1.astype(np.uint32),
                                        (B, 288)).copy())
    sizes = jnp.asarray(np.broadcast_to(sizes1.astype(np.int32),
                                        (B, 288)).copy())
    bb = jnp.asarray(np.full(B, len(prefix) * 8, np.int32))
    pv = jnp.asarray(np.full(B, acc, np.uint32))
    pn = jnp.asarray(np.full(B, nacc, np.int32))
    dev = jnp.asarray(imgs)
    budget = _budget(H, W, Cc)
    num_words = max(budget // 4 + 4, 8)

    desc_fn = jax.jit(functools.partial(build_desc, num_chans=Cc,
                                        cost_check=False))
    t = chain(desc_fn, dev, codes, sizes, pv, pn)
    print(f"enc desc : {t*1e3:7.1f}ms  {mpix/t:7.0f} MP/s")
    out = desc_fn(dev, codes, sizes, pv, pn)
    desc, tbl = jax.device_put(out[0]), jax.device_put(out[1])
    t = chain(functools.partial(encode_bits_fused, num_words=num_words),
              desc, tbl, bb)
    print(f"enc fuse : {t*1e3:7.1f}ms  {mpix/t:7.0f} MP/s")
    full = functools.partial(encode_kernel, num_chans=Cc, cost_check=False,
                             want_hist=False, num_words=num_words)
    t = chain(full, dev, codes, sizes, bb, pv, pn)
    print(f"enc full : {t*1e3:7.1f}ms  {mpix/t:7.0f} MP/s")

    # ---- decode ----
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
    allf = functools.partial(decode_kernel_tpu, h=H, w=W, c=Cc,
                             nc_pad=nc_pad, zlib_len_max=int(zl.max()))
    di, ok = allf(sj, lj, pj, zj)
    if not os.environ.get("FPNG_TPU_WALK_ABL"):  # ablations break results
        assert bool(np.asarray(ok).all())
        assert np.array_equal(np.asarray(di), imgs)
    t = chain(allf, sj, lj, pj, zj)
    print(f"dec all  : {t*1e3:7.1f}ms  {mpix/t:7.0f} MP/s")
    walkf = functools.partial(_decode_walk, nc_pad=nc_pad)
    t = chain(walkf, sj, lj, pj, zj)
    print(f"dec walk : {t*1e3:7.1f}ms")
    from fpng_tpu.ops.specdec_tpu import (_bpl_pad, _decode_finish,
                                          _finalize_records, _K8_CACHE,
                                          expand_tpu)
    from fpng_tpu.ops.bitpack import scatter_packed16_tpu
    k8 = next(iter(_K8_CACHE.values()))[0]
    wout = walkf(sj, lj, pj, zj)
    wargs = [jax.device_put(a) for a in wout[:6]]
    finf = functools.partial(_decode_finish, h=H, w=W, c=Cc,
                             nc_pad=nc_pad, k8=k8)
    t = chain(finf, *wargs, zj)
    print(f"dec fin  : {t*1e3:7.1f}ms  (k8={k8})")
    # finish decomposition: finalize kernel / transpose+deposit / expand
    posr, raw0, raw1, nst, e_fin, out0 = wargs
    row_stride = 1 + W * Cc
    geom = (row_stride, H * row_stride, Cc, _bpl_pad(W * Cc))
    fzf = jax.jit(functools.partial(
        _finalize_records, k8=k8, geom=geom))
    t = chain(fzf, posr[:, :, :k8], raw0[:, :, :k8], raw1[:, :, :k8],
              nst, e_fin, out0)
    print(f"dec fz   : {t*1e3:7.1f}ms  (records out transposed)")
    meta4, metb4, _chk = fzf(posr[:, :, :k8], raw0[:, :, :k8],
                             raw1[:, :, :k8], nst, e_fin, out0)
    meta4 = jax.device_put(meta4)
    metb4 = jax.device_put(metb4)
    bpl_pad = _bpl_pad(W * Cc)
    H8 = -(-H // 8) * 8
    dep_words = H8 * (bpl_pad // 2)

    @jax.jit
    def depf(meta4, metb4):
        B0 = meta4.shape[0]
        return scatter_packed16_tpu(meta4.reshape(B0, -1), dep_words,
                                    metb=metb4.reshape(B0, -1))

    t = chain(depf, meta4, metb4)
    print(f"dec dep  : {t*1e3:7.1f}ms  (deposit only; no transpose)")
    dep = jax.device_put(depf(meta4, metb4))
    exf = jax.jit(functools.partial(expand_tpu, h=H, w=W, c=Cc,
                                    bpl_pad=bpl_pad))

    @jax.jit
    def exrun(dep):
        return exf(jax.lax.bitcast_convert_type(dep, jnp.int32))

    t = chain(exrun, dep)
    print(f"dec exp  : {t*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
