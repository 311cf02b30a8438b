"""pngreader feature matrix: color types x depths x filters x Adam7.

The reference's pvpngreader supports color types 0/2/3/4/6, bit depths
1-16, all five filters and Adam7 interlace (pvpngreader.cpp:376-2252,
unpredict filters :1047-1152) and is fuzzed with zzuf (README.md:148).
These tests drive our equivalent (utils/pngreader.py) over the same
matrix with a test-side PNG writer, cross-validated against lodepng
(decoding the same crafted files to RGBA8).
"""

import struct
import zlib

import numpy as np
import pytest

from fpng_tpu.utils.pngreader import PngError, load_png

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data +
            struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _pack_row(samples: np.ndarray, depth: int) -> bytes:
    """1D array of sample values -> packed scanline bytes (no filter)."""
    if depth == 8:
        return samples.astype(np.uint8).tobytes()
    if depth == 16:
        return samples.astype(">u2").tobytes()
    bits = ((samples[:, None].astype(np.uint8) >>
             np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
    pad = (-len(bits)) % 8
    bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
    return np.packbits(bits).tobytes()


def _paeth(a, b, c):
    p = int(a) + int(b) - int(c)
    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
    if pa <= pb and pa <= pc:
        return int(a)
    if pb <= pc:
        return int(b)
    return int(c)


def _filter_rows(raw_rows: list[bytes], bpp: int, ftypes) -> bytes:
    """Apply per-row PNG filters (forward direction)."""
    out = bytearray()
    prev = None
    for y, row in enumerate(raw_rows):
        cur = np.frombuffer(row, np.uint8).astype(np.int32)
        up = (np.frombuffer(prev, np.uint8).astype(np.int32)
              if prev is not None else np.zeros_like(cur))
        ft = ftypes[y % len(ftypes)]
        if ft == 0:
            enc = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) \
                if len(cur) > bpp else np.zeros_like(cur)
            enc = (cur - left) % 256
        elif ft == 2:
            enc = (cur - up) % 256
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) \
                if len(cur) > bpp else np.zeros_like(cur)
            enc = (cur - ((left + up) >> 1)) % 256
        else:  # Paeth needs the *reconstructed* neighbours = raw ones
            enc = np.empty_like(cur)
            for x in range(len(cur)):
                a = cur[x - bpp] if x >= bpp else 0
                b = up[x]
                cc = up[x - bpp] if x >= bpp else 0
                enc[x] = (cur[x] - _paeth(a, b, cc)) % 256
        out.append(ft)
        out += enc.astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


def make_png(samples: np.ndarray, ctype: int, depth: int,
             ftypes=(0,), interlace: int = 0, plte: np.ndarray = None,
             trns: bytes = None) -> bytes:
    """Build a PNG from (h, w, channels) raw sample values."""
    h, w, ch = samples.shape
    assert ch == _CHANNELS[ctype]
    bpp = max((ch * depth + 7) // 8, 1)

    def rows_of(img):
        return [_pack_row(img[y].reshape(-1), depth)
                for y in range(img.shape[0])]

    if interlace == 0:
        payload = _filter_rows(rows_of(samples), bpp, ftypes)
    else:
        payload = b""
        for (x0, y0, dx, dy) in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            payload += _filter_rows(rows_of(sub), bpp, ftypes)

    hdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    png = bytes((137, 80, 78, 71, 13, 10, 26, 10))
    png += _chunk(b"IHDR", hdr)
    if plte is not None:
        png += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    if trns is not None:
        png += _chunk(b"tRNS", trns)
    png += _chunk(b"IDAT", zlib.compress(payload))
    png += _chunk(b"IEND", b"")
    return png


def _lodepng_rgba(reflib, png: bytes) -> np.ndarray:
    err, img, w, h = reflib.lodepng_decode(png)
    assert err == 0, f"lodepng rejected crafted png: {err}"
    return img


MATRIX = [(ct, d) for ct, depths in
          {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
           4: (8, 16), 6: (8, 16)}.items() for d in depths]


@pytest.mark.parametrize("ctype,depth", MATRIX)
@pytest.mark.parametrize("interlace", [0, 1])
def test_matrix_vs_lodepng(reflib, rng, ctype, depth, interlace):
    h, w = 13, 21
    ch = _CHANNELS[ctype]
    maxv = (1 << depth) - 1
    if ctype == 3:
        plte = rng.integers(0, 256, (1 << min(depth, 4), 3), np.uint8)
        samples = rng.integers(0, len(plte), (h, w, 1)).astype(np.uint16)
    else:
        plte = None
        samples = rng.integers(0, maxv + 1, (h, w, ch)).astype(np.uint16)
    ftypes = (0, 1, 2, 3, 4) if depth >= 8 else (0, 1, 2)
    png = make_png(samples, ctype, depth, ftypes=ftypes,
                   interlace=interlace, plte=plte)
    got, gw, gh, gch = load_png(png, 4)
    want = _lodepng_rgba(reflib, png)
    assert (gw, gh, gch) == (w, h, ch)
    assert np.array_equal(got, want), f"ct={ctype} d={depth} i={interlace}"


def test_subbyte_paeth_and_average(reflib, rng):
    """Sub-byte rows use bpp=1 for filters; exercise 3/4 explicitly."""
    samples = rng.integers(0, 2, (16, 40, 1)).astype(np.uint16)
    png = make_png(samples, 0, 1, ftypes=(3, 4))
    got, *_ = load_png(png, 3)
    want = _lodepng_rgba(reflib, png)[..., :3]
    assert np.array_equal(got, want)


def test_palette_trns(reflib, rng):
    plte = rng.integers(0, 256, (16, 3), np.uint8)
    samples = rng.integers(0, 16, (9, 11, 1)).astype(np.uint16)
    trns = bytes(rng.integers(0, 256, 5, np.uint8))  # partial alpha table
    png = make_png(samples, 3, 4, ftypes=(0, 1), plte=plte, trns=trns)
    got, *_ = load_png(png, 4)
    want = _lodepng_rgba(reflib, png)
    assert np.array_equal(got, want)
    assert (got[..., 3] != 255).any()


def test_gray_trns_key(reflib, rng):
    samples = rng.integers(0, 32, (8, 8, 1)).astype(np.uint16)
    samples[2:4] = 7
    png = make_png(samples, 0, 8, trns=struct.pack(">H", 7))
    got, *_ = load_png(png, 4)
    want = _lodepng_rgba(reflib, png)
    assert np.array_equal(got, want)
    assert (got[..., 3] == 0).any()


def test_rgb16_trns_key(reflib, rng):
    # 16-bit samples with equal hi/lo bytes keep 16->8 key matching
    # consistent between our MSB compare and lodepng's full-width compare
    v8 = rng.integers(0, 16, (6, 7, 3)).astype(np.uint16)
    samples = v8 * 257
    key = samples[0, 0]
    png = make_png(samples, 2, 16,
                   trns=struct.pack(">HHH", *[int(k) for k in key]))
    got, *_ = load_png(png, 4)
    want = _lodepng_rgba(reflib, png)
    assert np.array_equal(got, want)
    assert (got[..., 3] == 0).any()


def test_gray_alpha_16(reflib, rng):
    samples = (rng.integers(0, 256, (5, 6, 2)) * 257).astype(np.uint32)
    png = make_png(samples.astype(np.uint16), 4, 16, ftypes=(2, 4))
    got, *_ = load_png(png, 4)
    want = _lodepng_rgba(reflib, png)
    assert np.array_equal(got, want)


def test_adam7_tiny_dims(reflib, rng):
    """Adam7 with dims < 8: several passes are empty."""
    for (h, w) in ((1, 1), (2, 3), (5, 4), (7, 7), (8, 1), (1, 9)):
        samples = rng.integers(0, 256, (h, w, 3)).astype(np.uint16)
        png = make_png(samples, 2, 8, ftypes=(0, 1, 2), interlace=1)
        got, *_ = load_png(png, 3)
        want = _lodepng_rgba(reflib, png)[..., :3]
        assert np.array_equal(got, want), (h, w)


def test_malformed_rejected():
    base = make_png(np.zeros((4, 4, 3), np.uint16), 2, 8)
    # truncated IDAT payload
    bad = bytearray(base)
    ofs = base.index(b"IDAT") - 4
    n = struct.unpack(">I", base[ofs:ofs + 4])[0]
    inner = zlib.compress(b"\x00" * 5)  # too-short raster
    bad = base[:ofs] + _chunk(b"IDAT", inner) + base[ofs + 12 + n:]
    with pytest.raises(PngError):
        load_png(bytes(bad))
    # palette image without PLTE
    nop = make_png(np.zeros((2, 2, 1), np.uint16), 3, 8,
                   plte=np.zeros((2, 3), np.uint8))
    start = nop.index(b"PLTE") - 4
    end = start + 12 + 6
    with pytest.raises(PngError):
        load_png(nop[:start] + nop[end:])
    # bad chunk CRC
    bad2 = bytearray(base)
    bad2[-5] ^= 0xFF
    with pytest.raises(PngError):
        load_png(bytes(bad2))
