"""ctypes binding for the native frame-ingestion runtime (native/framepipe).

Builds the shared library on demand with the system toolchain; degrades
to None when no compiler is available (the pure-python FrameSource keeps
working). See native/framepipe.cpp for what it provides.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframepipe.so")
_lib = None


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fp_ring_create.restype = ctypes.c_void_p
    lib.fp_ring_create.argtypes = [ctypes.c_int] * 3
    lib.fp_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.fp_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fp_ring_pop_batch.restype = ctypes.c_int
    lib.fp_ring_pop_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float]
    lib.fp_ring_dropped.restype = ctypes.c_uint64
    lib.fp_ring_dropped.argtypes = [ctypes.c_void_p]
    lib.fp_ring_size.restype = ctypes.c_int
    lib.fp_ring_size.argtypes = [ctypes.c_void_p]
    lib.fp_ring_eos.restype = ctypes.c_int
    lib.fp_ring_eos.argtypes = [ctypes.c_void_p]
    lib.fp_start_ppm_stream.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fp_start_raw_stream.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fp_signal_eos.argtypes = [ctypes.c_void_p]
    lib.fp_letterbox.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_float]
    _lib = lib
    return lib


class FrameRing:
    """Lock-free SPSC frame ring with fused letterbox+normalize pops."""

    def __init__(self, capacity: int, frame_h: int, frame_w: int):
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError("native framepipe library unavailable")
        self.h, self.w = frame_h, frame_w
        self._ptr = ctypes.c_void_p(
            self.lib.fp_ring_create(capacity, frame_h, frame_w))

    def push(self, rgb_u8: np.ndarray):
        assert rgb_u8.shape == (self.h, self.w, 3) and \
            rgb_u8.dtype == np.uint8
        buf = np.ascontiguousarray(rgb_u8)
        self.lib.fp_ring_push(
            self._ptr, buf.ctypes.data_as(ctypes.c_char_p))

    def pop_batch(self, batch: int, out_h: int, out_w: int,
                  fill: float = 0.5) -> np.ndarray:
        out = np.empty((batch, out_h, out_w, 3), np.float32)
        got = self.lib.fp_ring_pop_batch(
            self._ptr, out.ctypes.data_as(ctypes.c_void_p),
            batch, out_h, out_w, ctypes.c_float(fill))
        return out[:got]

    def start_ppm_stream(self, path: str):
        self.lib.fp_start_ppm_stream(self._ptr, path.encode())

    def start_raw_stream(self, path: str):
        self.lib.fp_start_raw_stream(self._ptr, path.encode())

    @property
    def size(self) -> int:
        return self.lib.fp_ring_size(self._ptr)

    @property
    def dropped(self) -> int:
        return self.lib.fp_ring_dropped(self._ptr)

    @property
    def eos(self) -> bool:
        return bool(self.lib.fp_ring_eos(self._ptr))

    def signal_eos(self):
        self.lib.fp_signal_eos(self._ptr)

    def close(self):
        if self._ptr:
            self.lib.fp_ring_destroy(self._ptr)
            self._ptr = None


def native_letterbox(rgb_u8: np.ndarray, out_hw, fill: float = 0.5
                     ) -> Optional[np.ndarray]:
    """Single-frame fused letterbox+normalize; None without the library."""
    lib = load_library()
    if lib is None:
        return None
    ih, iw = rgb_u8.shape[:2]
    oh, ow = out_hw
    out = np.empty((oh, ow, 3), np.float32)
    buf = np.ascontiguousarray(rgb_u8)
    lib.fp_letterbox(buf.ctypes.data_as(ctypes.c_char_p), ih, iw,
                     out.ctypes.data_as(ctypes.c_void_p), oh, ow,
                     ctypes.c_float(fill))
    return out
