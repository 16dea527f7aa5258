"""PulseAudio sink (reference: src/pulse.cpp), gated on libpulse-simple.

The reference uses the threaded mainloop API with corked synchronized L/R
streams; here the simple blocking API via ctypes suffices for the
block-synchronous pipeline (one write per 125 ms batch, s16 interleaved).
When libpulse-simple is absent the output disables itself and reports
``available = False`` (the app layer logs and drops it).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np


def _load():
    name = ctypes.util.find_library("pulse-simple")
    if not name:
        return None
    try:
        return ctypes.CDLL(name)
    except OSError:
        return None


_LIB = _load()

PA_STREAM_PLAYBACK = 1
PA_SAMPLE_S16LE = 3


class _SampleSpec(ctypes.Structure):
    _fields_ = [("format", ctypes.c_int), ("rate", ctypes.c_uint32), ("channels", ctypes.c_uint8)]


class PulseOutput:
    def __init__(self, sample_rate: int, stereo: bool = False, server: str | None = None, sink: str | None = None, stream_name: str = "rtlsdr-airband-tpu"):
        self.available = _LIB is not None
        self.s = None
        self.stereo = stereo
        if not self.available:
            return
        spec = _SampleSpec(PA_SAMPLE_S16LE, sample_rate, 2 if stereo else 1)
        err = ctypes.c_int(0)
        _LIB.pa_simple_new.restype = ctypes.c_void_p
        self.s = _LIB.pa_simple_new(
            server.encode() if server else None,
            b"rtlsdr-airband-tpu",
            PA_STREAM_PLAYBACK,
            sink.encode() if sink else None,
            stream_name.encode(),
            ctypes.byref(spec),
            None,
            None,
            ctypes.byref(err),
        )
        if not self.s:
            self.available = False

    def write(self, left: np.ndarray, right: np.ndarray | None = None) -> None:
        if not self.available or self.s is None:
            return
        left = np.clip(np.asarray(left, np.float32), -1, 1)
        if self.stereo:
            r = np.clip(np.asarray(right if right is not None else left, np.float32), -1, 1)
            buf = np.empty(left.size * 2, np.float32)
            buf[0::2] = left
            buf[1::2] = r
        else:
            buf = left
        pcm = (buf * 32767.0).astype("<i2").tobytes()
        err = ctypes.c_int(0)
        if _LIB.pa_simple_write(self.s, pcm, len(pcm), ctypes.byref(err)) < 0:
            self.available = False

    def close(self) -> None:
        if self.available and self.s is not None:
            _LIB.pa_simple_free(self.s)
            self.s = None
            self.available = False
