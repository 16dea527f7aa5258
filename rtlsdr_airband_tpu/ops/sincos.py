"""Fixed-point phase and interpolated sin/cos lookup.

The derotator removes the phase rotation introduced by the sliding FFT window
using a 24-bit fixed-point phase accumulator and a 256-entry linearly
interpolated sin/cos table (reference: src/util.cpp:103-127, applied at
src/rtl_airband.cpp:510-517). We reproduce this *exactly* (including the LUT
interpolation error) so that demodulated audio can be compared to the
reference within an SNR bound without phase drift.

A "precise" mode computing true sin/cos is also provided for performance runs
where LUT parity is not required.
"""

from __future__ import annotations

import numpy as np

from ..constants import PHASE_MOD

LUT_SIZE = 256


def make_sincos_tables(dtype=np.float32):
    """257-entry sin/cos tables (last entry wraps). reference: util.cpp:105-110."""
    i = np.arange(LUT_SIZE, dtype=np.float32)
    ang = (2.0 * np.pi * i / float(LUT_SIZE)).astype(np.float32)
    sin_lut = np.sin(ang).astype(dtype)
    cos_lut = np.cos(ang).astype(dtype)
    sin_lut = np.concatenate([sin_lut, sin_lut[:1]])
    cos_lut = np.concatenate([cos_lut, cos_lut[:1]])
    return sin_lut, cos_lut


def sincos_lut(phi, sin_lut, cos_lut, xp=np):
    """Interpolated sin/cos of fixed-point phase ``phi`` in [0, 2^24).

    Works for numpy or jax.numpy arrays (pass the module as ``xp``).
    reference: util.cpp:113-127.
    """
    phi = phi.astype(xp.uint32) if hasattr(phi, "astype") else xp.uint32(phi)
    idx = (phi >> 16).astype(xp.int32)
    fract = (phi & xp.uint32(0xFFFF)).astype(xp.float32) / xp.float32(65536.0)
    s1 = xp.take(sin_lut, idx)
    s2 = xp.take(sin_lut, idx + 1)
    c1 = xp.take(cos_lut, idx)
    c2 = xp.take(cos_lut, idx + 1)
    sine = s1 + (s2 - s1) * fract
    cosine = c1 + (c2 - c1) * fract
    return sine, cosine


def compute_dm_dphi(channel_freq: int, center_freq: int, sample_rate: int, wave_rate: int) -> int:
    """Per-audio-sample derotation phase increment, 24-bit fixed point.

    Includes the correction for the fractional error of rounding
    sample_rate/wave_rate to an integer hop. reference: config.cpp:679-712.
    Returns a python int in [0, 2^32) (uint32 semantics of the reference).
    """
    dm_dphi = float(channel_freq - center_freq)
    decimation_factor = float(sample_rate) / float(wave_rate)
    correction = (wave_rate / 2.0) * (decimation_factor - round(decimation_factor))
    correction *= float(channel_freq - center_freq) / (sample_rate / 2.0)
    dm_dphi -= correction
    dm_dphi /= float(wave_rate)
    dm_dphi -= np.trunc(dm_dphi)
    dm_dphi *= 256.0 * 65536.0
    # Cast through signed int (reference: config.cpp:709), then uint32.
    return int(np.int64(int(dm_dphi)) & 0xFFFFFFFF)


def phase_advance(phi, dphi, xp=np):
    """phi' = (phi + dphi) mod 2^24 in uint32 arithmetic."""
    return (phi + dphi) & (xp.uint32(PHASE_MOD - 1))
