"""End-to-end verification drive on the real TPU.

Encodes real image content (example.png tiles) through the batched device
encoder in all three modes, validates every produced file with decoders
sharing no code with this repo (python zlib + manual defilter, the compiled
reference fpng, lodepng), round-trips through our own device decoder, and
prints timing. Run: python .build/verify_drive.py
"""

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from ref_oracle import (CodecsOracle, RefOracle,  # noqa: E402
                        _build_codecs_shim, _build_ref_shim)

import fpng_tpu as F  # noqa: E402
from fpng_tpu import constants as C  # noqa: E402


def defilter_check(png: bytes, img: np.ndarray) -> bool:
    """Fully independent reconstruction: zlib + per-row Up defilter."""
    h, w, c = img.shape
    # find IDAT
    ofs = 8
    idat = b""
    while ofs + 8 <= len(png):
        ln = int.from_bytes(png[ofs:ofs + 4], "big")
        ty = png[ofs + 4:ofs + 8]
        if ty == b"IDAT":
            idat += png[ofs + 8:ofs + 8 + ln]
        ofs += 12 + ln
    raw = zlib.decompress(idat)
    stride = 1 + w * c
    assert len(raw) == h * stride, (len(raw), h * stride)
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)
    filt = rows[:, 0]
    assert filt[0] == 0 and (filt[1:] <= 2).all()
    out = np.zeros((h, w * c), np.uint8)
    prev = np.zeros(w * c, np.uint8)
    for y in range(h):
        cur = rows[y, 1:].copy()
        if filt[y] == 2:
            cur = cur + prev
        elif filt[y] != 0:
            return False
        out[y] = cur
        prev = cur
    return bool(np.array_equal(out.reshape(h, w, c), img))


def main():
    shim = _build_ref_shim()
    ref = RefOracle(shim)
    # arm's-length conformance validator: wuffs is the strictest public
    # PNG decoder (its strictness forced fpng's 2-dist-code rule,
    # fpng.cpp:2058-2074); every emitted file must pass it bit-exactly
    cshim = _build_codecs_shim()
    wuffs = CodecsOracle(cshim) if cshim else None
    if wuffs is None:
        print("WARNING: codecs shim unavailable - wuffs validation off",
              file=sys.stderr)
    err, src, w, h = ref.lodepng_decode(
        open("/root/reference/example.png", "rb").read())
    assert err == 0

    B, TH, TW = 8, 256, 256
    tiles3 = np.stack([
        np.ascontiguousarray(src[(i * 37) % (h - TH):(i * 37) % (h - TH) + TH,
                                 (i * 53) % (w - TW):(i * 53) % (w - TW) + TW, :3])
        for i in range(B)])
    tiles4 = np.stack([np.dstack([t, np.full((TH, TW), 255, np.uint8)])
                       for t in tiles3])
    tiles4[..., 3] = tiles4[..., 1]  # correlated alpha (swizzle stress)

    import jax
    print("devices:", jax.devices())

    failures = 0
    for name, tiles, flags in [
        ("1pass-3ch", tiles3, 0),
        ("1pass-4ch", tiles4, 0),
        ("2pass-3ch", tiles3, C.FPNG_ENCODE_SLOWER),
        ("2pass-4ch", tiles4, C.FPNG_ENCODE_SLOWER),
        ("stored-3ch", tiles3, C.FPNG_FORCE_UNCOMPRESSED),
    ]:
        t0 = time.perf_counter()
        pngs = F.encode_batch(tiles, flags)
        t1 = time.perf_counter()
        pngs = F.encode_batch(tiles, flags)
        t2 = time.perf_counter()
        sizes = [len(p) for p in pngs]
        for i, (png, img) in enumerate(zip(pngs, tiles)):
            ok_z = defilter_check(png, img)
            st, out, ww, hh, cc = ref.decode(png, img.shape[2])
            ok_ref = (st == 0 and np.array_equal(
                np.asarray(out).reshape(img.shape), img))
            lerr, lp, lw, lh = ref.lodepng_decode(png)
            ok_lp = lerr == 0
            exp4 = img if img.shape[2] == 4 else np.dstack(
                [img, np.full(img.shape[:2], 255, np.uint8)])
            ok_lp = ok_lp and np.array_equal(lp, exp4)
            ok_wf = True
            if wuffs is not None:
                wst, wimg = wuffs.wuffs_decode(png)
                ok_wf = (wst == 0 and np.array_equal(wimg, exp4))
            # pngcheck-class structural validation (chunk grammar,
            # ordering, CRCs, scanline structure - reference README.md:81)
            from fpng_tpu.utils.pngcheck import check as png_check

            violations = png_check(png)
            if not (ok_z and ok_ref and ok_lp and ok_wf and
                    not violations):
                print(f"FAIL {name}[{i}]: zlib={ok_z} ref={ok_ref} "
                      f"lodepng={ok_lp} wuffs={ok_wf} "
                      f"pngcheck={violations or 'ok'}")
                failures += 1
        # reference size comparison on same tiles
        ref_sizes = [len(ref.encode(img, flags)) for img in tiles]
        # our device decode roundtrip
        t3 = time.perf_counter()
        sts, outs = F.decode_batch(pngs, tiles.shape[3])
        t4 = time.perf_counter()
        sts, outs = F.decode_batch(pngs, tiles.shape[3])
        t5 = time.perf_counter()
        for i in range(B):
            if sts[i] != C.FPNG_DECODE_SUCCESS or not np.array_equal(
                    outs[i], tiles[i]):
                print(f"FAIL {name}[{i}]: self-decode status={sts[i]}")
                failures += 1
        mpix = B * TH * TW / 1e6
        print(f"{name}: enc {t1-t0:.1f}s cold / {mpix/(t2-t1):.1f} MPix/s warm; "
              f"dec {t4-t3:.1f}s cold / {mpix/(t5-t4):.1f} MPix/s warm; "
              f"size {sum(sizes)} vs ref {sum(ref_sizes)} "
              f"({sum(sizes)/sum(ref_sizes)*100:.2f}%)")

    # negative probes
    bad = bytearray(F.encode_batch(tiles3[:1], 0)[0])
    bad[30] ^= 0xFF
    st, img_, *_ = F.fpng_decode_memory(bytes(bad), 3)
    assert st != C.FPNG_DECODE_SUCCESS, "corrupt container must not decode"
    sts, outs = F.decode_batch([bytes(bad)], 3)
    assert sts[0] != C.FPNG_DECODE_SUCCESS
    print("negative probes ok")

    # deep-chunk probe: a checkerboard defeats matching while 2-pass
    # tables give its two delta symbols 1-2 bit codes -> ~170 walk
    # steps in one 512-bit chunk, past the fixpoint's _RMW_ROWS re-walk
    # cap; on TPU this exercises the truncation sentinel + full-rows
    # re-run path (specdec_tpu.decode_kernel_tpu)
    y, x = np.mgrid[0:64, 0:64]
    cb = (((x + y) % 2)[..., None] * np.full(3, 17)).astype(np.uint8)
    cb = np.stack([cb] * 4)
    cb_pngs = F.encode_batch(cb, C.FPNG_ENCODE_SLOWER)
    csts, couts = F.decode_batch(cb_pngs, 3)
    for i in range(len(cb_pngs)):
        if csts[i] != C.FPNG_DECODE_SUCCESS or not np.array_equal(
                couts[i], cb[i]):
            print(f"FAIL deep-chunk[{i}]: status={csts[i]}")
            failures += 1
    print("deep-chunk probe ok" if not failures else
          "deep-chunk probe FAILED")

    failures += corrupted_stream_sweep(tiles3)
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


def corrupted_stream_sweep(tiles3: np.ndarray, rounds: int = 10) -> int:
    """Real-hardware corrupted-stream sweep for the Pallas walk kernel.

    Ports test_decode_fuzz.py's payload-corruption classes to the device
    decoder: several hundred corrupted deflate streams run through
    decode_kernel_tpu on the TPU, each checked DIFFERENTIALLY against the
    scalar golden model on the same corrupted bytes - the kernel must
    agree on acceptance, and any accepted stream must decode to the
    oracle's pixels (reject-or-correct; no silent corruption).  The
    in-kernel constraint accumulators (ops/specdec_tpu.py) are the unit
    under test; corruption stays past each image's header end so the
    pristine pre-parsed LUT remains the right table for both sides.
    """
    import jax.numpy as jnp

    from fpng_tpu.golden import decode_zlib
    from fpng_tpu.models.decoder import _parse_one
    from fpng_tpu.ops.specdec import pack_lut
    from fpng_tpu.ops.specdec_tpu import decode_kernel_tpu, plan_tpu

    B, TH, TW = 16, 64, 64
    tiles = np.ascontiguousarray(tiles3[:8, :TH, :TW])
    tiles = np.concatenate([tiles, 255 - tiles])[:B]
    pngs = F.encode_batch(tiles, 0)
    metas = [_parse_one(p) for p in pngs]
    assert all(m[7] is not None for m in metas)
    nb = 64
    while nb < max(len(m[4]) for m in metas):
        nb *= 2
    base = np.zeros((B, nb), np.uint8)
    luts = np.zeros((B, 4096), np.uint32)
    p0 = np.zeros(B, np.int32)
    zl = np.zeros(B, np.int32)
    for j, m in enumerate(metas):
        _, _, _, _, src, p, z, lut = m
        base[j, :len(src)] = np.frombuffer(src, np.uint8)
        luts[j] = pack_lut(lut)
        p0[j] = p
        zl[j] = z
    nc_pad = plan_tpu(int(zl.max()))
    hdr_end = (p0 + 7) // 8
    rng = np.random.default_rng(0xC0DE)

    fails = total = agree_rej = agree_ok = 0
    lj = jnp.asarray(luts)
    pj = jnp.asarray(p0)
    for rnd in range(rounds):
        bad = base.copy()
        zr = zl.copy()
        for j in range(B):
            lo, hi = int(hdr_end[j]), int(zl[j])
            cls = (rnd + j) % 5
            if cls == 0:    # single bit flips
                for pos in rng.integers(lo, hi, 3):
                    bad[j, pos] ^= 1 << int(rng.integers(0, 8))
            elif cls == 1:  # byte xor burst
                pos = int(rng.integers(lo, hi - 4))
                bad[j, pos:pos + 4] ^= rng.integers(
                    1, 256, 4).astype(np.uint8)
            elif cls == 2:  # zero-fill run (kills the code stream)
                pos = int(rng.integers(lo, hi - 8))
                bad[j, pos:pos + 8] = 0
            elif cls == 3:  # truncation via shortened zlib length
                zr[j] = int(rng.integers(lo + 5, hi))
                bad[j, zr[j]:] = 0
            else:           # tail corruption near EOB/adler
                pos = int(rng.integers(max(lo, hi - 9), hi))
                bad[j, pos] ^= 0xFF
        di, ok = decode_kernel_tpu(
            jnp.asarray(bad), lj, pj, jnp.asarray(zr),
            h=TH, w=TW, c=3, nc_pad=nc_pad)
        di = np.asarray(di)
        okh = np.asarray(ok)
        for j in range(B):
            total += 1
            oracle = decode_zlib(bad[j].tobytes(), int(zr[j]), TW, TH, 3)
            if bool(okh[j]) != (oracle is not None):
                print(f"SWEEP FAIL r{rnd}[{j}]: kernel ok={bool(okh[j])} "
                      f"oracle={'ok' if oracle is not None else 'reject'}")
                fails += 1
            elif okh[j]:
                agree_ok += 1
                if not np.array_equal(di[j], oracle):
                    print(f"SWEEP FAIL r{rnd}[{j}]: accepted pixels "
                          f"diverge from oracle")
                    fails += 1
            else:
                agree_rej += 1
    print(f"corrupted-stream sweep: {total} streams, "
          f"{agree_rej} rejected, {agree_ok} accepted-and-equal, "
          f"{fails} failures")
    return fails


if __name__ == "__main__":
    main()
