"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh (multi-chip sharding tests run
without TPU hardware) and builds the reference-oracle shared library once
per session.
"""

import ctypes
import os
import subprocess
import sys

# Tests always run on a virtual 8-device CPU mesh.  The container's
# sitecustomize registers the axon TPU plugin and forces JAX_PLATFORMS=axon,
# so override both the env and (since jax may already be imported) the
# config value itself.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_SRC = "/root/reference/src"
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "..", ".build", "ref_shim")


def _build_ref_shim() -> str | None:
    """Compile the reference fpng + lodepng into a test-oracle .so (cached)."""
    if not os.path.isdir(REFERENCE_SRC):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so = os.path.join(_BUILD_DIR, "libfpngref.so")
    srcs = [
        os.path.join(os.path.dirname(__file__), "ref_shim", "shim.cpp"),
        os.path.join(REFERENCE_SRC, "fpng.cpp"),
        os.path.join(REFERENCE_SRC, "lodepng.cpp"),
    ]
    if os.path.exists(so) and all(
            os.path.getmtime(so) > os.path.getmtime(s) for s in srcs):
        return so
    cmd = ["g++", "-O2", "-std=c++14", "-shared", "-fPIC",
           "-fno-strict-aliasing", "-msse4.1", "-mpclmul",
           f"-I{REFERENCE_SRC}", *srcs, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        # retry without SSE (non-x86 or missing intrinsics)
        cmd = ["g++", "-O2", "-std=c++14", "-shared", "-fPIC",
               "-fno-strict-aliasing", "-DFPNG_NO_SSE=1",
               f"-I{REFERENCE_SRC}", *srcs, "-o", so]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except subprocess.CalledProcessError:
            return None
    return so


class RefOracle:
    """ctypes wrapper over the compiled reference library."""

    def __init__(self, path: str):
        lib = ctypes.CDLL(path)
        lib.ref_encode.restype = ctypes.c_int
        lib.ref_decode.restype = ctypes.c_int
        lib.ref_get_info.restype = ctypes.c_int
        lib.ref_crc32.restype = ctypes.c_uint32
        lib.ref_crc32.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.c_uint32]
        lib.ref_adler32.restype = ctypes.c_uint32
        lib.ref_adler32.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.c_uint32]
        lib.ref_init()
        self.lib = lib

    def encode(self, img: np.ndarray, flags: int = 0) -> bytes | None:
        h, w, c = img.shape
        img = np.ascontiguousarray(img, dtype=np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        out_len = ctypes.c_size_t()
        ok = self.lib.ref_encode(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, c, flags, ctypes.byref(out), ctypes.byref(out_len))
        if not ok:
            return None
        data = ctypes.string_at(out, out_len.value)
        self.lib.ref_free(out)
        return data

    def decode(self, png: bytes, desired: int = 4):
        out = ctypes.POINTER(ctypes.c_uint8)()
        out_len = ctypes.c_size_t()
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        ch = ctypes.c_uint32()
        st = self.lib.ref_decode(png, len(png), desired, ctypes.byref(out),
                                 ctypes.byref(out_len), ctypes.byref(w),
                                 ctypes.byref(h), ctypes.byref(ch))
        img = None
        if st == 0 and out_len.value:
            buf = ctypes.string_at(out, out_len.value)
            img = np.frombuffer(buf, np.uint8).reshape(
                h.value, w.value, desired).copy()
        self.lib.ref_free(out)
        return st, img, w.value, h.value, ch.value

    def get_info(self, png: bytes):
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        ch = ctypes.c_uint32()
        st = self.lib.ref_get_info(png, len(png), ctypes.byref(w),
                                   ctypes.byref(h), ctypes.byref(ch))
        return st, w.value, h.value, ch.value

    def crc32(self, data: bytes, prev: int = 0) -> int:
        return self.lib.ref_crc32(data, len(data), prev)

    def adler32(self, data: bytes, prev: int = 1) -> int:
        return self.lib.ref_adler32(data, len(data), prev)

    def lodepng_decode(self, png: bytes):
        out = ctypes.POINTER(ctypes.c_uint8)()
        w = ctypes.c_uint()
        h = ctypes.c_uint()
        err = self.lib.ref_lodepng_decode(png, len(png), ctypes.byref(out),
                                          ctypes.byref(w), ctypes.byref(h))
        if err:
            return err, None, 0, 0
        buf = ctypes.string_at(out, w.value * h.value * 4)
        self.lib.ref_free(out)
        img = np.frombuffer(buf, np.uint8).reshape(h.value, w.value, 4).copy()
        return 0, img, w.value, h.value


@pytest.fixture(scope="session")
def reflib():
    so = _build_ref_shim()
    if so is None:
        pytest.skip("reference oracle unavailable (no toolchain/reference)")
    return RefOracle(so)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xF96)


def make_test_image(rng, h, w, c, kind="mixed"):
    """Structured test image: flat runs + gradients + noise."""
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    if kind in ("mixed", "flat") and h >= 4 and w >= 4:
        img[h // 4:h // 2, :] = rng.integers(0, 256, c, dtype=np.uint8)
        img[:, w // 4:w // 3] = rng.integers(0, 256, c, dtype=np.uint8)
    if kind == "mixed" and h >= 8:
        grad = (np.arange(w, dtype=np.int32)[None, :, None] % 256)
        img[3 * h // 4:, :, :] = (grad + img[3 * h // 4:, :1, :1]).astype(np.uint8)
    if c == 4 and kind != "noise":
        img[..., 3] = np.where(rng.random((h, w)) < 0.7, 255, img[..., 3])
    return img


@pytest.fixture(scope="session")
def images(rng):
    """A varied set of (img,) test images across shapes/channels."""
    shapes = [(1, 1), (1, 7), (7, 1), (2, 2), (13, 17), (16, 16),
              (33, 7), (64, 64), (40, 100), (3, 300), (127, 31)]
    out = []
    for c in (3, 4):
        for h, w in shapes:
            for kind in ("mixed", "flat", "noise"):
                out.append(make_test_image(rng, h, w, c, kind))
    return out
