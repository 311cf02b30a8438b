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
