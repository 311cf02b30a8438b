"""Checksums as parallel reductions (TPU restatement of the SSE paths).

Adler-32: the (A, B) state update is affine, so whole-buffer checksums
decompose into per-chunk (sum, weighted-sum) pairs combined with modular
arithmetic - the tree-reduction analog of the reference's 8-accumulator
SSE 4.1 loop (fpng.cpp:403-463).

CRC-32: CRC is GF(2)-linear in the message: the raw (init-0) register of a
buffer is the XOR of per-(position, bit) contributions.  With a fixed chunk
length L we precompute every in-chunk contribution, reduce each chunk with
vectorized XORs, then combine chunks in a log-depth tree using
x^(8*L*2^t) mod P shift matrices - the parallel analog of the reference's
pclmulqdq folding (fpng.cpp:251-291).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ADLER_MOD = 65521
_ADLER_CHUNK = 1024  # keeps per-chunk weighted sums < 2^31


def _mod_sum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Sum of values < 65521 along axis, mod 65521, int32-overflow-safe."""
    n = x.shape[axis]
    if n <= 32000:
        return jnp.sum(x, axis=axis, dtype=jnp.int32) % ADLER_MOD
    pad = (-n) % 32000
    xp = jnp.moveaxis(x, axis, -1)
    xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(0, pad)])
    xp = xp.reshape(*xp.shape[:-1], -1, 32000)
    inner = jnp.sum(xp, axis=-1, dtype=jnp.int32) % ADLER_MOD
    return jnp.sum(inner, axis=-1, dtype=jnp.int32) % ADLER_MOD


def adler32_bytes(data: jnp.ndarray) -> jnp.ndarray:
    """Adler-32 of each row of a (B, N) uint8 array -> (B,) uint32."""
    B, N = data.shape
    L = _ADLER_CHUNK
    pad = (-N) % L
    d = jnp.pad(data, ((0, 0), (0, pad))).astype(jnp.int32)
    K = d.shape[1] // L
    d = d.reshape(B, K, L)
    w = jnp.arange(L, 0, -1, dtype=jnp.int32)[None, None, :]  # weights L..1
    s1 = jnp.sum(d, axis=2, dtype=jnp.int32)
    s2 = jnp.sum(d * w, axis=2, dtype=jnp.int32)
    # True chunk lengths (final chunk may be short; its zero padding adds
    # nothing to s1 but s2 used weight L-j instead of len-j: subtract).
    lens = jnp.minimum(jnp.maximum(N - jnp.arange(K, dtype=jnp.int32) * L, 0), L)
    s1m = s1 % ADLER_MOD
    s2c = (s2 - (L - lens)[None, :] * s1) % ADLER_MOD
    cum = jnp.cumsum(s1m, axis=1, dtype=jnp.int32)
    a_before = (1 + cum - s1m) % ADLER_MOD  # A entering each chunk
    terms = ((lens % ADLER_MOD)[None, :] * a_before + s2c) % ADLER_MOD
    b_fin = _mod_sum(terms, axis=1)
    a_fin = (1 + _mod_sum(s1m, axis=1)) % ADLER_MOD
    return (b_fin.astype(jnp.uint32) << 16) | a_fin.astype(jnp.uint32)


# ---------------------------------------------------------------------------
# CRC-32 (PNG polynomial, reflected algorithm)
# ---------------------------------------------------------------------------

_CRC_POLY = 0xEDB88320
_CRC_CHUNK = 256


@functools.lru_cache(maxsize=None)
def _byte_table() -> tuple:
    t = np.zeros(256, np.uint32)
    for b in range(256):
        c = b
        for _ in range(8):
            c = (c >> 1) ^ (_CRC_POLY if c & 1 else 0)
        t[b] = c
    return tuple(int(x) for x in t)


def _advance_byte(vals: np.ndarray) -> np.ndarray:
    """Advance raw CRC registers through one zero byte."""
    t = np.asarray(_byte_table(), np.uint32)
    return (vals >> np.uint32(8)) ^ t[vals & np.uint32(0xFF)]


@functools.lru_cache(maxsize=None)
def _shift1_matrix() -> tuple:
    """Shift-by-one-byte GF(2) matrix as 32 uint32 basis images."""
    basis = np.array([np.uint32(1) << b for b in range(32)], np.uint32)
    return tuple(int(x) for x in _advance_byte(basis))


def _gf2_compose(m2: tuple, m1: tuple) -> tuple:
    """(m2 after m1) as basis images: out[b] = m2(m1[b])."""
    out = []
    for b in range(32):
        v = m1[b]
        acc = 0
        for k in range(32):
            if (v >> k) & 1:
                acc ^= m2[k]
        out.append(acc)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _shift_pow2_matrix(t: int) -> tuple:
    """Matrix advancing a CRC register through 2^t zero bytes."""
    if t == 0:
        return _shift1_matrix()
    m = _shift_pow2_matrix(t - 1)
    return _gf2_compose(m, m)


@functools.lru_cache(maxsize=None)
def _shift_matrix(nbytes: int) -> tuple:
    """Matrix advancing a CRC register through `nbytes` zero bytes."""
    m = tuple(1 << b for b in range(32))  # identity
    t = 0
    while nbytes:
        if nbytes & 1:
            m = _gf2_compose(_shift_pow2_matrix(t), m)
        nbytes >>= 1
        t += 1
    return m


def _shift_crc(nbytes: int, crc: int) -> int:
    m = _shift_matrix(nbytes)
    acc = 0
    for b in range(32):
        if (crc >> b) & 1:
            acc ^= m[b]
    return acc


def _apply_shift_device(crc: jnp.ndarray, rows: tuple) -> jnp.ndarray:
    r = jnp.asarray(np.array(rows, np.uint32))
    out = jnp.zeros_like(crc)
    for b in range(32):
        bit = (crc >> jnp.uint32(b)) & jnp.uint32(1)
        out = out ^ (bit * r[b])
    return out


@functools.lru_cache(maxsize=None)
def _position_bit_table(chunk: int) -> np.ndarray:
    """(chunk, 8) uint32: contribution of bit k of byte j to the raw CRC
    register of a `chunk`-byte block."""
    t = np.asarray(_byte_table(), np.uint32)
    bit = np.zeros((chunk, 8), np.uint32)
    cur = t[np.uint32(1) << np.arange(8)]  # final byte's bit contributions
    for j in range(chunk - 1, -1, -1):
        bit[j] = cur
        cur = _advance_byte(cur)
    return bit


def crc32_raw(data: jnp.ndarray) -> jnp.ndarray:
    """Init-0 CRC register ("raw") of each row of a (B, N) byte array.

    raw() is GF(2)-linear in the message and leading zero bytes are
    raw-neutral, so chunks are front-aligned by zero padding and combined
    with shift matrices in a log-depth tree.
    """
    B, N = data.shape
    L = _CRC_CHUNK
    pad = (-N) % L
    d = jnp.pad(data, ((0, 0), (pad, 0))).astype(jnp.int32)
    K = max(d.shape[1] // L, 1)
    d = d.reshape(B, K, L)
    bit = jnp.asarray(_position_bit_table(L))  # (L, 8)

    acc = jnp.zeros((B, K), jnp.uint32)
    for k in range(8):
        m = ((d >> k) & 1).astype(jnp.uint32)
        contrib = m * bit[:, k][None, None, :]
        acc = acc ^ jax.lax.reduce(contrib, np.uint32(0),
                                   jax.lax.bitwise_xor, (2,))

    span = L  # bytes represented by each register at the current level
    while K > 1:
        if K % 2:  # prepend an all-zero segment (raw-neutral)
            acc = jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), acc], axis=1)
            K += 1
        left, right = acc[:, 0::2], acc[:, 1::2]
        acc = _apply_shift_device(left, _shift_matrix(span)) ^ right
        span *= 2
        K //= 2
    return acc[:, 0]


def crc32_bytes(data: jnp.ndarray) -> jnp.ndarray:
    """Standard CRC-32 of each row of a (B, N) uint8 array -> (B,) uint32.

    crc(msg) = raw(msg) ^ shift_N(0xFFFFFFFF) ^ 0xFFFFFFFF, where raw() is
    the init-0 register.
    """
    N = data.shape[1]
    init = _shift_crc(N, 0xFFFFFFFF)
    return crc32_raw(data) ^ jnp.uint32(init) ^ jnp.uint32(0xFFFFFFFF)


# --- variable-length CRC finalization (device-side container assembly) ----
#
# A batch shares one padded buffer length N but each image's message ends at
# its own byte offset.  With trailing zeros, raw(msg || 0^k) = shift_k(raw),
# and the byte-shift map is invertible over GF(2), so the true crc comes from
# ONE per-image variable inverse shift:
#   crc_b = invshift_{k_b}( raw(X_b) ^ shift_N(0xFFFFFFFF) ) ^ 0xFFFFFFFF
# where k_b = N - len_b.  (shift_len(init) = invshift_k(shift_N(init)).)


@functools.lru_cache(maxsize=None)
def _inv_shift1_matrix() -> tuple:
    """GF(2) inverse of the shift-by-one-byte matrix (basis images)."""
    fwd = _shift1_matrix()
    # Gauss-Jordan over GF(2): rows are bit positions, columns packed in
    # uint32s.  aug[i] = (fwd column space | identity).
    a = [fwd[b] for b in range(32)]          # a[b] = image of basis vec b
    inv = [1 << b for b in range(32)]        # identity
    # Solve M * x = e_i for each i; represent M columns = a[b].
    # Build 32x32 bit matrix rows: row r bit b = (a[b] >> r) & 1.
    rows = []
    for r in range(32):
        v = 0
        for b in range(32):
            v |= ((a[b] >> r) & 1) << b
        rows.append(v)
    eye = [1 << r for r in range(32)]
    for col in range(32):
        piv = next(r for r in range(col, 32) if (rows[r] >> col) & 1)
        rows[col], rows[piv] = rows[piv], rows[col]
        eye[col], eye[piv] = eye[piv], eye[col]
        for r in range(32):
            if r != col and (rows[r] >> col) & 1:
                rows[r] ^= rows[col]
                eye[r] ^= eye[col]
    # eye now holds M^{-1} in row form: bit b of eye[r] = M^{-1}[r, b].
    out = []
    for b in range(32):  # basis image of e_b under M^{-1}
        v = 0
        for r in range(32):
            v |= ((eye[r] >> b) & 1) << r
        out.append(v)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _inv_shift_pow2_matrix(t: int) -> tuple:
    """Matrix REVERSING a CRC register through 2^t zero bytes."""
    if t == 0:
        return _inv_shift1_matrix()
    m = _inv_shift_pow2_matrix(t - 1)
    return _gf2_compose(m, m)


def crc32_var_unshift(raw: jnp.ndarray, k: jnp.ndarray,
                      max_k: int) -> jnp.ndarray:
    """Reverse each raw register through k[b] (< max_k) zero bytes."""
    nbits = max(int(max_k).bit_length(), 1)
    k = jnp.maximum(k, 0).astype(jnp.uint32)
    bits32 = jnp.arange(32, dtype=jnp.uint32)
    for t in range(nbits):
        m = jnp.asarray(np.array(_inv_shift_pow2_matrix(t), np.uint32))
        rbits = (raw[:, None] >> bits32[None, :]) & jnp.uint32(1)  # (B, 32)
        shifted = jax.lax.reduce(rbits * m[None, :], np.uint32(0),
                                 jax.lax.bitwise_xor, (1,))
        raw = jnp.where(((k >> t) & 1).astype(bool), shifted, raw)
    return raw


def crc32_bytes_var(data: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """CRC-32 of data[b, :lens[b]] for each row; bytes at idx >= lens[b]
    MUST already be zero (the caller masks them)."""
    B, N = data.shape
    raw = crc32_raw(data)
    init_n = _shift_crc(N, 0xFFFFFFFF)
    k = jnp.int32(N) - lens.astype(jnp.int32)
    out = crc32_var_unshift(raw ^ jnp.uint32(init_n), k, N)
    return out ^ jnp.uint32(0xFFFFFFFF)


def crc32_var_shift(raw: jnp.ndarray, k: jnp.ndarray,
                    max_k: int) -> jnp.ndarray:
    """Advance each raw register through k[b] (<= max_k) zero bytes —
    the forward twin of crc32_var_unshift."""
    nbits = max(int(max_k).bit_length(), 1)
    k = jnp.maximum(k, 0).astype(jnp.uint32)
    bits32 = jnp.arange(32, dtype=jnp.uint32)
    for t in range(nbits):
        m = jnp.asarray(np.array(_shift_pow2_matrix(t), np.uint32))
        rbits = (raw[:, None] >> bits32[None, :]) & jnp.uint32(1)  # (B, 32)
        shifted = jax.lax.reduce(rbits * m[None, :], np.uint32(0),
                                 jax.lax.bitwise_xor, (1,))
        raw = jnp.where(((k >> t) & 1).astype(bool), shifted, raw)
    return raw


# --- word-domain raw CRC (device container assembly hot path) --------------
#
# The encode kernel's output is (B, NW) uint32 little-endian words; the old
# assembly path expanded them to int32 bytes (4x the HBM traffic) before the
# 8-bit-plane chunk reduction.  Here the position-bit table is word-granular
# — entry [k][j] is the contribution of bit k of LE word j to the raw CRC of
# a 4096-byte chunk — and a Pallas kernel reads each word tile ONCE from HBM,
# does the 32-plane XOR accumulation in VMEM, and emits one uint32 register
# per 1024-word chunk.  Per-image [plen, tb) byte masking (prefix bytes are
# spliced on host; bytes past the payload are dead) rides the same pass, so
# the CRC input tensor is never materialized at all.

_WCRC_CW = 1024   # words per chunk register (4096 bytes = one (8,128) tile)
_WCRC_CH = 64     # chunks per grid step


@functools.lru_cache(maxsize=None)
def _word_bit_table() -> np.ndarray:
    """(32, 8, 128) uint32: contribution of bit k of LE word (s*128 + l)
    to the raw CRC register of a 4096-byte chunk."""
    byte_tab = np.array(_position_bit_table(_WCRC_CW * 4), np.uint32)
    j = np.arange(_WCRC_CW)
    out = np.zeros((32, _WCRC_CW), np.uint32)
    for k in range(32):
        out[k] = byte_tab[4 * j + k // 8, k % 8]
    return out.reshape(32, 8, 128)


def _ones_below(c: jnp.ndarray) -> jnp.ndarray:
    """uint32 mask of the low 8*c bits, c in [0, 4]."""
    cc = jnp.minimum(c, 3).astype(jnp.uint32)
    m = (jnp.uint32(1) << (jnp.uint32(8) * cc)) - jnp.uint32(1)
    return jnp.where(c >= 4, jnp.uint32(0xFFFFFFFF), m)


def _crc_words_kernel(lo_ref, hi_ref, w_ref, bit_ref, out_ref, *, ch):
    """Masked 32-plane XOR accumulation over `ch` 1024-word chunks.

    lo/hi (SMEM): per-image byte bounds — bytes outside [lo, hi) are
    treated as zero.  out: one raw register per chunk, deposited at its
    flat lane position (row c>>7, lane c&127) of an (8, 128) tile."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    lo = lo_ref[b, 0]
    hi = hi_ref[b, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    res = jnp.zeros((8, 128), jnp.uint32)
    for c in range(ch):
        w = w_ref[0, c]  # (8, 128) uint32
        b0 = 4 * (((g * ch + c) * _WCRC_CW) + row * 128 + lane)
        mask = ~_ones_below(jnp.clip(lo - b0, 0, 4)) & \
            _ones_below(jnp.clip(hi - b0, 0, 4))
        wm = w & mask
        acc = jnp.zeros((8, 128), jnp.uint32)
        for k in range(32):
            bitk = bit_ref[k]
            acc = acc ^ jnp.where(
                ((wm >> jnp.uint32(k)) & 1).astype(bool), bitk,
                jnp.uint32(0))
        # XOR-fold to an all-equal tile, then deposit at flat position c
        for s in (64, 32, 16, 8, 4, 2, 1):
            acc = acc ^ pltpu.roll(acc, s, 1)
        for s in (4, 2, 1):
            acc = acc ^ pltpu.roll(acc, s, 0)
        res = jnp.where((row == (c >> 7)) & (lane == (c & 127)), acc, res)
    out_ref[0, 0] = res


@functools.partial(jax.jit, static_argnames=("interpret",))
def crc32_words_masked_raw(words: jnp.ndarray, lo: jnp.ndarray,
                           hi: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Init-0 CRC register of each row of a (B, NW) uint32 LE word buffer
    with bytes outside [lo[b], hi[b]) treated as zero.  NW must be a
    multiple of 1024; the result is the raw register of the FULL 4*NW-byte
    (masked) message — callers unshift the 4*NW - hi zero tail."""
    B, NW = words.shape
    assert NW % _WCRC_CW == 0, NW
    K = NW // _WCRC_CW
    ch = min(_WCRC_CH, K)
    G = -(-K // ch)
    wr = words.reshape(B, K, 8, 128)
    bit = jnp.asarray(_word_bit_table())
    lo2 = lo.astype(jnp.int32).reshape(B, 1)
    hi2 = hi.astype(jnp.int32).reshape(B, 1)
    regs = pl.pallas_call(
        functools.partial(_crc_words_kernel, ch=ch),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ch, 8, 128), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 8, 128), lambda b, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda b, g: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, 8, 128), jnp.uint32),
        interpret=interpret,
    )(lo2, hi2, wr, bit)
    acc = regs.reshape(B, G * _WCRC_CW)[:, :K]

    span = _WCRC_CW * 4
    while K > 1:
        if K % 2:  # prepend an all-zero segment (raw-neutral)
            acc = jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), acc],
                                  axis=1)
            K += 1
        left, right = acc[:, 0::2], acc[:, 1::2]
        acc = _apply_shift_device(left, _shift_matrix(span)) ^ right
        span *= 2
        K //= 2
    return acc[:, 0]


@functools.lru_cache(maxsize=None)
def _bit_table_4() -> np.ndarray:
    """(32,) uint32: contribution of bit k of an LE word to the raw CRC
    of its own 4 bytes as a standalone 4-byte message."""
    t = np.array(_position_bit_table(4), np.uint32)  # (4, 8)
    return np.array([t[k // 8, k % 8] for k in range(32)], np.uint32)


def crc32_raw4_le(word: jnp.ndarray) -> jnp.ndarray:
    """Raw (init-0) CRC register of the 4 bytes of each LE uint32."""
    tab = jnp.asarray(_bit_table_4())
    out = jnp.zeros_like(word)
    for k in range(32):
        out = out ^ jnp.where(((word >> jnp.uint32(k)) & 1).astype(bool),
                              tab[k], jnp.uint32(0))
    return out


def crc32_raw_prefix_host(msgs: list[bytes]) -> np.ndarray:
    """Host-side raw (init-0) CRC registers of short per-image prefixes
    (the constant "IDAT" tag + serialized zlib/dynamic-header bytes),
    vectorized over the batch with the byte table."""
    t = np.asarray(_byte_table(), np.uint32)
    B = len(msgs)
    n = max((len(m) for m in msgs), default=0)
    buf = np.zeros((B, n), np.uint8)
    lens = np.zeros(B, np.int64)
    for b, m in enumerate(msgs):
        buf[b, :len(m)] = np.frombuffer(m, np.uint8)
        lens[b] = len(m)
    r = np.zeros(B, np.uint32)
    for j in range(n):
        step = (r >> np.uint32(8)) ^ t[(r ^ buf[:, j]) & np.uint32(0xFF)]
        r = np.where(j < lens, step, r)
    return r
