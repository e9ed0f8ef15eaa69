"""ctypes wrapper for the native C++ frame ring (io/native/frame_ring.cpp).

Builds the shared library on first use (g++ -O2, cached beside the
source), exposing real-time frame-queue semantics to the streaming loop:
capture threads ``push`` without blocking (oldest frames overwritten), the
TPU feed ``pop_latest`` (freshest frame + drop count) or ``pop_next``
(in-order, for offline video).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "frame_ring.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "native", "libframe_ring.so")
_BUILD_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                 "-pthread", _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.frame_ring_create.restype = ctypes.c_void_p
        lib.frame_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.frame_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.frame_ring_push.restype = ctypes.c_int64
        lib.frame_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.frame_ring_pop_latest.restype = ctypes.c_int64
        lib.frame_ring_pop_latest.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.frame_ring_pop_next.restype = ctypes.c_int64
        lib.frame_ring_pop_next.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.frame_ring_pending.restype = ctypes.c_int64
        lib.frame_ring_pending.argtypes = [ctypes.c_void_p]
        lib.frame_ring_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class FrameRing:
    """A fixed-capacity ring of (H, W, C) uint8 frames, thread-safe,
    zero-allocation on the frame path."""

    def __init__(self, frame_shape: Tuple[int, ...], capacity: int = 8):
        self.frame_shape = tuple(int(v) for v in frame_shape)
        self.frame_bytes = int(np.prod(self.frame_shape))
        self._lib = _load_library()
        self._handle = self._lib.frame_ring_create(
            ctypes.c_size_t(capacity), ctypes.c_size_t(self.frame_bytes))
        if not self._handle:
            raise MemoryError("frame_ring_create failed")
        self._scratch = np.empty(self.frame_shape, np.uint8)

    def push(self, frame: np.ndarray) -> int:
        """Copy a frame in; never blocks (oldest frame overwritten)."""
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        if frame.shape != self.frame_shape:
            raise ValueError(f"frame shape {frame.shape} != ring shape "
                             f"{self.frame_shape}")
        return self._lib.frame_ring_push(
            self._handle, frame.ctypes.data_as(ctypes.c_char_p))

    def pop_latest(self, timeout_ms: int = 100
                   ) -> Optional[Tuple[np.ndarray, int]]:
        """(newest frame copy, frames dropped past) or None on timeout."""
        out = np.empty(self.frame_shape, np.uint8)
        rc = self._lib.frame_ring_pop_latest(
            self._handle, out.ctypes.data_as(ctypes.c_char_p),
            ctypes.c_int(timeout_ms))
        if rc < 0:
            return None
        return out, int(rc)

    def pop_next(self, timeout_ms: int = 100
                 ) -> Optional[Tuple[np.ndarray, int]]:
        """(next in-order frame copy, its sequence no.) or None."""
        out = np.empty(self.frame_shape, np.uint8)
        rc = self._lib.frame_ring_pop_next(
            self._handle, out.ctypes.data_as(ctypes.c_char_p),
            ctypes.c_int(timeout_ms))
        if rc < 0:
            return None
        return out, int(rc)

    @property
    def pending(self) -> int:
        return int(self._lib.frame_ring_pending(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.frame_ring_close(self._handle)

    def __del__(self):
        handle, self._handle = getattr(self, "_handle", None), None
        if handle:
            self._lib.frame_ring_destroy(handle)


__all__ = ["FrameRing"]
