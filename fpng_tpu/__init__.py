"""fpng_tpu - a TPU-native batched PNG codec with fpng's capabilities.

Single-image API mirrors the reference's seven entry points (fpng.h:17-111);
the batched API (encode_batch / decode_batch) is the TPU-first surface: one
XLA program per same-shape image batch, shardable over a device mesh via
fpng_tpu.parallel.

Outputs are standard PNGs restricted to the fpng subset (filter 0/2, RLE
matches at distance == channel count inside a single dynamic-Huffman deflate
block, fdEC marker chunk); the fast decoder accepts only that subset and
reports NOT_FPNG otherwise so callers can fall back to a general decoder.
"""

from __future__ import annotations

import numpy as np

from .constants import (  # noqa: F401  (public API re-exports)
    FPNG_DECODE_FAILED_CHUNK_PARSING,
    FPNG_DECODE_FAILED_DIMENSIONS_TOO_LARGE,
    FPNG_DECODE_FAILED_HEADER_CRC32,
    FPNG_DECODE_FAILED_INVALID_DIMENSIONS,
    FPNG_DECODE_FAILED_INVALID_IDAT,
    FPNG_DECODE_FAILED_NOT_PNG,
    FPNG_DECODE_FILE_OPEN_FAILED,
    FPNG_DECODE_FILE_READ_FAILED,
    FPNG_DECODE_FILE_SEEK_FAILED,
    FPNG_DECODE_FILE_TOO_LARGE,
    FPNG_DECODE_INVALID_ARG,
    FPNG_DECODE_NOT_FPNG,
    FPNG_DECODE_SUCCESS,
    FPNG_ENCODE_SLOWER,
    FPNG_FORCE_UNCOMPRESSED,
)
from .container import adler32 as fpng_adler32  # noqa: F401
from .container import crc32 as fpng_crc32  # noqa: F401
from .container import get_info as fpng_get_info  # noqa: F401

__version__ = "0.1.0"

_initialized = False
_fallback_warned: set = set()


def _warn_fallback(api: str, exc: Exception) -> None:
    """One-time-per-API stderr notice when a device-path failure reroutes
    to the scalar golden model: the result stays correct but runs at a
    tiny fraction of device speed, which must not regress silently."""
    if api in _fallback_warned:
        return
    _fallback_warned.add(api)
    import sys

    print(f"fpng_tpu: {api} device path failed ({type(exc).__name__}: "
          f"{str(exc)[:160]}); falling back to the scalar golden model "
          f"(correct but slow; further notices suppressed)",
          file=sys.stderr)


def fpng_init() -> None:
    """Library init (device discovery happens lazily on first batch call)."""
    global _initialized
    _initialized = True


def fpng_encode_image_to_memory(image, w: int, h: int, num_chans: int,
                                flags: int = 0) -> bytes | None:
    """Single-image encode (fpng.h:48 parity).

    Routed through the batched device pipeline (whose output is
    byte-identical to the scalar golden model); falls back to the golden
    model if no usable accelerator/jit path is available.
    """
    img = np.asarray(image, dtype=np.uint8)
    if img.size != w * h * num_chans or num_chans not in (3, 4):
        return None
    img = img.reshape(h, w, num_chans)
    try:
        return encode_batch(img[None], flags)[0]
    except ValueError:
        return None
    except Exception as e:  # noqa: BLE001 - no device/jit: scalar fallback
        _warn_fallback("fpng_encode_image_to_memory", e)
        from . import golden
        return golden.encode_image_to_memory(image, w, h, num_chans, flags)


def fpng_encode_image_to_file(filename: str, image, w: int, h: int,
                              num_chans: int, flags: int = 0) -> bool:
    data = fpng_encode_image_to_memory(image, w, h, num_chans, flags)
    if data is None:
        return False
    with open(filename, "wb") as f:
        f.write(data)
    return True


def fpng_decode_memory(data: bytes, desired_channels: int = 4):
    """(status, image (h,w,desired) | None, w, h, channels_in_file).

    Routed through the batched device decoder; falls back to the scalar
    golden model when no jit path is available.
    """
    if not data or desired_channels not in (3, 4):
        return FPNG_DECODE_INVALID_ARG, None, 0, 0, 0
    try:
        from .models.decoder import decode_batch as _impl
        statuses, images, infos = _impl([bytes(data)], desired_channels,
                                        with_info=True)
    except Exception as e:  # noqa: BLE001 - no device/jit: scalar fallback
        _warn_fallback("fpng_decode_memory", e)
        from . import golden
        return golden.decode_memory(data, desired_channels)
    w, h, ch = infos[0]
    return statuses[0], images[0], w, h, ch


def fpng_decode_file(filename: str, desired_channels: int = 4):
    import os
    try:
        size = os.path.getsize(filename)
    except OSError:
        return FPNG_DECODE_FILE_OPEN_FAILED, None, 0, 0, 0
    if size > 0xFFFFFFFF:
        return FPNG_DECODE_FILE_TOO_LARGE, None, 0, 0, 0
    try:
        with open(filename, "rb") as f:
            data = f.read()
    except OSError:
        return FPNG_DECODE_FILE_READ_FAILED, None, 0, 0, 0
    return fpng_decode_memory(data, desired_channels)


# ---------------------------------------------------------------------------
# Batched TPU API
# ---------------------------------------------------------------------------


def encode_batch(images: np.ndarray, flags: int = 0) -> list[bytes]:
    """Encode a batch of same-shape (B, H, W, C) uint8 images on device."""
    from .models.encoder import encode_batch as _impl
    return _impl(images, flags)


def decode_batch(pngs: list[bytes], desired_channels: int = 4):
    """Decode a batch of fpng PNGs on device; returns (status, images)."""
    from .models.decoder import decode_batch as _impl
    return _impl(pngs, desired_channels)


def encode_batch_stream(batches, flags: int = 0):
    """Pipelined multi-batch encode: yields list[bytes] per input batch.

    Overlaps batch k+1's H2D + histogram with batch k's table build,
    D2H readback, and container assembly (the serving shape).
    """
    from .models.encoder import encode_batch_stream as _impl
    return _impl(batches, flags)


def decode_batch_stream(png_batches, desired_channels: int = 4):
    """Pipelined multi-batch decode: yields (statuses, images) per batch."""
    from .models.decoder import decode_batch_stream as _impl
    return _impl(png_batches, desired_channels)
