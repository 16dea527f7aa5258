"""ctypes binding for the native ingest runtime (native/ingest.cpp).

Provides NativeRingBuffer / native sample converters / NativeFileReader with
the same interfaces as the pure-Python fallbacks in inputs/base.py and
ops/sampleconv.py.  The shared library is auto-built with make on first use
if g++ is available; ``native_available()`` gates every consumer so the
package works (slower) without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO = os.path.join(_NATIVE_DIR, "libingest.so")
_lib = None
_tried = False
_lock = threading.Lock()


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and os.path.exists(os.path.join(_NATIVE_DIR, "ingest.cpp")):
            _build()
        if not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        c = ctypes
        lib.ring_new.restype = c.c_void_p
        lib.ring_new.argtypes = [c.c_size_t, c.c_size_t]
        lib.ring_free.argtypes = [c.c_void_p]
        lib.ring_append.restype = c.c_int
        lib.ring_append.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
        lib.ring_available.restype = c.c_size_t
        lib.ring_available.argtypes = [c.c_void_p]
        lib.ring_overflow_count.restype = c.c_uint64
        lib.ring_overflow_count.argtypes = [c.c_void_p]
        lib.ring_read.restype = c.c_int
        lib.ring_read.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
        lib.convert_u8_f32.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
        lib.convert_s8_f32.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
        lib.convert_s16_f32.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t, c.c_float]
        lib.convert_f32_scale.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t, c.c_float]
        lib.file_reader_new.restype = c.c_void_p
        lib.file_reader_new.argtypes = [c.c_char_p, c.c_void_p, c.c_double, c.c_double, c.c_size_t]
        lib.file_reader_start.argtypes = [c.c_void_p]
        lib.file_reader_state.restype = c.c_int
        lib.file_reader_state.argtypes = [c.c_void_p]
        lib.file_reader_stop.argtypes = [c.c_void_p]
        lib.file_reader_free.argtypes = [c.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeRingBuffer:
    """Same interface as inputs.base.RingBuffer, backed by C++."""

    def __init__(self, size: int, extra: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native ingest library unavailable")
        self._lib = lib
        self._r = lib.ring_new(size, extra)
        self.size = size
        self.extra = extra

    def append(self, data) -> bool:
        buf = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else np.ascontiguousarray(data, np.uint8)
        return bool(self._lib.ring_append(self._r, buf.ctypes.data_as(ctypes.c_void_p), buf.size))

    def available(self) -> int:
        return int(self._lib.ring_available(self._r))

    @property
    def overflow_count(self) -> int:
        return int(self._lib.ring_overflow_count(self._r))

    def read(self, n: int):
        out = np.empty(n, np.uint8)
        if not self._lib.ring_read(self._r, out.ctypes.data_as(ctypes.c_void_p), n):
            return None
        return out

    def __del__(self):
        try:
            if getattr(self, "_r", None):
                self._lib.ring_free(self._r)
                self._r = None
        except Exception:
            pass


def convert_iq(raw, sfmt: str, fullscale: float | None = None) -> np.ndarray:
    """Native sample-format decode to [L, 2] f32 pairs (drop-in for
    ops.sampleconv.decode_iq)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable")
    if sfmt == "u8":
        x = np.frombuffer(raw, np.uint8) if isinstance(raw, (bytes, bytearray)) else np.ascontiguousarray(raw, np.uint8)
        out = np.empty(x.size, np.float32)
        lib.convert_u8_f32(x.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p), x.size)
    elif sfmt == "s8":
        x = np.frombuffer(raw, np.int8) if isinstance(raw, (bytes, bytearray)) else np.ascontiguousarray(raw).view(np.int8)
        out = np.empty(x.size, np.float32)
        lib.convert_s8_f32(x.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p), x.size)
    elif sfmt == "s16":
        x = np.frombuffer(raw, np.int16) if isinstance(raw, (bytes, bytearray)) else np.ascontiguousarray(raw, np.int16)
        out = np.empty(x.size, np.float32)
        lib.convert_s16_f32(x.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p), x.size, float(fullscale or 32768.0))
    elif sfmt == "f32":
        x = np.frombuffer(raw, np.float32) if isinstance(raw, (bytes, bytearray)) else np.ascontiguousarray(raw, np.float32)
        out = np.empty(x.size, np.float32)
        lib.convert_f32_scale(x.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p), x.size, float(fullscale or 1.0))
    else:
        raise ValueError(f"unknown sample format {sfmt}")
    return out.reshape(-1, 2)


class NativeFileReader:
    """Paced file RX thread living entirely in C++ (no GIL contention with
    the block loop)."""

    STATE = {0: "UNKNOWN", 1: "INITIALIZED", 2: "RUNNING", 3: "FAILED", 4: "STOPPED"}

    def __init__(self, path: str, ring: NativeRingBuffer, bytes_per_sec: float, speedup: float, chunk: int = 262144):
        lib = _load()
        if lib is None:
            raise RuntimeError("native ingest library unavailable")
        self._lib = lib
        self._fr = lib.file_reader_new(path.encode(), ring._r, float(bytes_per_sec), float(speedup), chunk)
        if not self._fr:
            raise FileNotFoundError(path)

    def start(self) -> None:
        self._lib.file_reader_start(self._fr)

    @property
    def state(self) -> str:
        return self.STATE[self._lib.file_reader_state(self._fr)]

    def stop(self) -> None:
        if self._fr:
            self._lib.file_reader_stop(self._fr)

    def __del__(self):
        try:
            if getattr(self, "_fr", None):
                self._lib.file_reader_free(self._fr)
                self._fr = None
        except Exception:
            pass
