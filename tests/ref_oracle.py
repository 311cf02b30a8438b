"""Compiled reference-library oracle (fpng + lodepng via ctypes).

Import-side-effect free: does NOT touch JAX platform config, so it is
usable both from the pytest conftest (CPU mesh) and from TPU drive
scripts (.build/verify_drive.py).
"""

import ctypes
import os
import subprocess

import numpy as np

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


def _build_codecs_shim() -> str | None:
    """Compile the reference's vendored qoi/stb/wuffs into a comparison-
    codec + conformance-validator .so (cached; wuffs is large, ~40s)."""
    if not os.path.isdir(REFERENCE_SRC):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so = os.path.join(_BUILD_DIR, "libcodecs.so")
    src = os.path.join(os.path.dirname(__file__), "ref_shim", "codecs.cpp")
    if os.path.exists(so) and os.path.getmtime(so) > os.path.getmtime(src):
        return so
    cmd = ["g++", "-O2", "-std=c++14", "-shared", "-fPIC",
           "-fno-strict-aliasing", f"-I{REFERENCE_SRC}", src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        return None
    return so


class CodecsOracle:
    """ctypes wrapper over the vendored comparison codecs + wuffs."""

    def __init__(self, path: str):
        lib = ctypes.CDLL(path)
        for fn in ("codecs_qoi_encode", "codecs_qoi_decode",
                   "codecs_stbi_write_png", "codecs_stbi_load",
                   "codecs_wuffs_decode"):
            getattr(lib, fn).restype = ctypes.c_int
        self.lib = lib

    def _take(self, out, out_len):
        data = ctypes.string_at(out, out_len)
        self.lib.codecs_free(out)
        return data

    def qoi_encode(self, img: np.ndarray) -> bytes | None:
        h, w, c = img.shape
        img = np.ascontiguousarray(img, np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = ctypes.c_size_t()
        if not self.lib.codecs_qoi_encode(
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                w, h, c, ctypes.byref(out), ctypes.byref(n)):
            return None
        return self._take(out, n.value)

    def qoi_decode(self, data: bytes, desired: int):
        out = ctypes.POINTER(ctypes.c_uint8)()
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        ch = ctypes.c_uint32()
        if not self.lib.codecs_qoi_decode(
                data, len(data), desired, ctypes.byref(out),
                ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch)):
            return None
        buf = self._take(out, w.value * h.value * desired)
        return np.frombuffer(buf, np.uint8).reshape(
            h.value, w.value, desired).copy()

    def stbi_write_png(self, img: np.ndarray) -> bytes | None:
        h, w, c = img.shape
        img = np.ascontiguousarray(img, np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = ctypes.c_size_t()
        if not self.lib.codecs_stbi_write_png(
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                w, h, c, ctypes.byref(out), ctypes.byref(n)):
            return None
        return self._take(out, n.value)

    def stbi_load(self, png: bytes, desired: int):
        out = ctypes.POINTER(ctypes.c_uint8)()
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        ch = ctypes.c_uint32()
        if not self.lib.codecs_stbi_load(
                png, len(png), desired, ctypes.byref(out), ctypes.byref(w),
                ctypes.byref(h), ctypes.byref(ch)):
            return None
        buf = self._take(out, w.value * h.value * desired)
        return np.frombuffer(buf, np.uint8).reshape(
            h.value, w.value, desired).copy()

    def wuffs_decode(self, png: bytes):
        """(status, rgba) - status != 0 means wuffs REJECTED the file."""
        out = ctypes.POINTER(ctypes.c_uint8)()
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        st = self.lib.codecs_wuffs_decode(png, len(png), ctypes.byref(out),
                                          ctypes.byref(w), ctypes.byref(h))
        if st != 0:
            return st, None
        buf = self._take(out, w.value * h.value * 4)
        return 0, np.frombuffer(buf, np.uint8).reshape(
            h.value, w.value, 4).copy()


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

    def lodepng_encode(self, img: np.ndarray) -> bytes | None:
        h, w, c = img.shape
        img = np.ascontiguousarray(img, np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = ctypes.c_size_t()
        err = self.lib.ref_lodepng_encode(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, c, ctypes.byref(out), ctypes.byref(n))
        if err:
            return None
        data = ctypes.string_at(out, n.value)
        self.lib.ref_free(out)
        return data

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
