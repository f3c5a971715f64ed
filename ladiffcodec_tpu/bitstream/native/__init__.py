"""ctypes binding for the native bitstream codec (codec.cc), built on demand
with g++ (no pybind11 in the image).  Falls back to None when no compiler is
available; callers then use the pure-Python reference implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import typing as tp

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "codec.cc")
_LIB = os.path.join(_HERE, "libldccodec.so")
_lock = threading.Lock()
_lib: tp.Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> tp.Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        i64, i32p, u8p, f32p, i64p, vp = (
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.uint8),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int64),
            ctypes.c_void_p,
        )
        lib.ldc_pack_codes.restype = i64
        lib.ldc_pack_codes.argtypes = [i32p, i64, ctypes.c_int, u8p]
        lib.ldc_unpack_codes.restype = i64
        lib.ldc_unpack_codes.argtypes = [u8p, i64, ctypes.c_int, i64, i32p]
        lib.ldc_build_cdf.restype = None
        lib.ldc_build_cdf.argtypes = [f32p, i64, ctypes.c_int, ctypes.c_float, i64, i64p]
        lib.ldc_build_cdfs.restype = None
        lib.ldc_build_cdfs.argtypes = [f32p, i64, i64, ctypes.c_int, ctypes.c_float, i64, i64p]
        lib.ldc_encoder_new.restype = vp
        lib.ldc_encoder_new.argtypes = [ctypes.c_int]
        lib.ldc_encoder_push.restype = None
        lib.ldc_encoder_push.argtypes = [vp, i32p, i64, i64p, i64]
        lib.ldc_encoder_finish.restype = i64
        lib.ldc_encoder_finish.argtypes = [vp, u8p, i64]
        lib.ldc_encoder_free.restype = None
        lib.ldc_encoder_free.argtypes = [vp]
        lib.ldc_decoder_new.restype = vp
        lib.ldc_decoder_new.argtypes = [u8p, i64, ctypes.c_int]
        lib.ldc_decoder_pull.restype = i64
        lib.ldc_decoder_pull.argtypes = [vp, i64p, i64, i64, i32p]
        lib.ldc_decoder_tell.restype = i64
        lib.ldc_decoder_tell.argtypes = [vp]
        lib.ldc_decoder_free.restype = None
        lib.ldc_decoder_free.argtypes = [vp]
        _lib = lib
        return _lib


# ---- high-level numpy API ----


def available() -> bool:
    return get_lib() is not None


def pack_codes(codes: np.ndarray, bits: int) -> bytes:
    lib = get_lib()
    codes = np.ascontiguousarray(codes, np.int32)
    out = np.empty((codes.size * bits) // 8 + 2, np.uint8)
    n = lib.ldc_pack_codes(codes.ravel(), codes.size, bits, out)
    return out[:n].tobytes()


def unpack_codes(data: bytes, bits: int, count: int) -> np.ndarray:
    lib = get_lib()
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(count, np.int32)
    n = lib.ldc_unpack_codes(np.ascontiguousarray(buf), len(buf), bits, count, out)
    if n < 0:
        raise EOFError("stream ended early")
    return out


def build_cdf(pdf: np.ndarray, total_range_bits: int = 24, roundoff: float = 1e-8,
              min_range: int = 2) -> np.ndarray:
    lib = get_lib()
    pdf = np.ascontiguousarray(pdf, np.float32)
    out = np.empty(pdf.size, np.int64)
    lib.ldc_build_cdf(pdf, pdf.size, total_range_bits, roundoff, min_range, out)
    return out


def build_cdfs(pdfs: np.ndarray, total_range_bits: int = 24, roundoff: float = 1e-8,
               min_range: int = 2) -> np.ndarray:
    """Batched CDF build: (..., card) float PDFs -> (..., card) int64 CDFs
    in one library call."""
    lib = get_lib()
    pdfs = np.ascontiguousarray(pdfs, np.float32)
    n = pdfs.shape[-1]
    k = pdfs.size // n
    out = np.empty(pdfs.size, np.int64)
    lib.ldc_build_cdfs(pdfs.reshape(-1), k, n, total_range_bits, roundoff, min_range, out)
    return out.reshape(pdfs.shape)


class NativeArithmeticCoder:
    """Drop-in fast replacement for bitstream.ac.ArithmeticCoder over frames."""

    def __init__(self, total_range_bits: int = 24):
        self._lib = get_lib()
        self._h = self._lib.ldc_encoder_new(total_range_bits)
        self.total_range_bits = total_range_bits

    def push_frame(self, symbols: np.ndarray, cdfs: np.ndarray) -> None:
        """symbols (K,), cdfs (K, cdf_len) int64."""
        symbols = np.ascontiguousarray(symbols, np.int32)
        cdfs = np.ascontiguousarray(cdfs, np.int64)
        self._lib.ldc_encoder_push(self._h, symbols, symbols.size, cdfs, cdfs.shape[-1])

    def finish(self) -> bytes:
        cap = 1 << 20
        while True:
            out = np.empty(cap, np.uint8)
            n = self._lib.ldc_encoder_finish(self._h, out, cap)
            if n >= 0:
                self._lib.ldc_encoder_free(self._h)
                self._h = None
                return out[:n].tobytes()
            cap = -n


class NativeArithmeticDecoder:
    def __init__(self, data: bytes, total_range_bits: int = 24):
        self._lib = get_lib()
        self.total_range_bits = total_range_bits
        buf = np.frombuffer(data, np.uint8)
        self._h = self._lib.ldc_decoder_new(np.ascontiguousarray(buf), len(buf),
                                            total_range_bits)

    def pull_frame(self, cdfs: np.ndarray) -> np.ndarray:
        """cdfs (K, cdf_len) -> symbols (K,)."""
        cdfs = np.ascontiguousarray(cdfs, np.int64)
        out = np.empty(cdfs.shape[0], np.int32)
        n = self._lib.ldc_decoder_pull(self._h, cdfs, cdfs.shape[-1], cdfs.shape[0], out)
        if n == -1:
            raise EOFError("stream ended sooner than expected")
        if n < 0:
            raise RuntimeError("corrupt arithmetic-coded stream")
        return out

    def tell(self) -> int:
        """Bytes consumed from the input so far."""
        return int(self._lib.ldc_decoder_tell(self._h))

    def close(self) -> None:
        if self._h is not None:
            self._lib.ldc_decoder_free(self._h)
            self._h = None
