"""TPU channelizer: batched sliding-window DFT-at-bin extraction.

The reference computes one size-N windowed FFT per output audio sample and
takes a single bin per channel (reference: src/rtl_airband.cpp:394,457-490;
hop = round(sample_rate / wave_rate)).  On TPU this becomes one batched
operation over a whole block of frames.  Two equivalent kernels:

 - ``channelize_matmul`` (default): since only C bins are consumed, the
   windowed DFT at those bins is a complex matmul ``frames @ taps^H`` with
   taps[c, n] = window[n] * exp(-2πi bin_c n / N).  This runs on the MXU and
   needs no FFT at all — the right tool when C << N (the RTLSDR-Airband
   regime: a handful to a few thousand channels against N=512..8192 bins).

 - ``channelize_fft``: batched ``jnp.fft.fft`` over [n_frames, N] frames plus
   a bin gather.  Preferable when C is O(N) (full-spectrum consumers).

Frames are built with static slice+concat (no gather): the input block is
viewed as [n_frames(+q), hop] rows and q row-shifted copies are concatenated.

IQ REPRESENTATION: complex values cross every jit boundary as float32 arrays
with a trailing dimension of 2 (..., [re, im]).  The axon TPU runtime cannot
transfer complex64 buffers host<->device (UNIMPLEMENTED), and split real
arithmetic is also what the MXU wants — complex dtypes only ever appear
transiently inside a jitted program (e.g. around jnp.fft.fft).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# Explicit MXU precision for the channelizer matmul.  On v5e the DEFAULT f32
# dot is a single bf16 pass once C is large enough to hit the MXU: measured
# 52.9 dB SNR vs f64 at C=8192 — below the >=80 dB E2E audio bound
# (tests/test_e2e_reference.py).  HIGH (bf16_3x) restores 98.4 dB for +13%
# channelizer time (~3% of block time); HIGHEST (f32_6x) gives 135.8 dB at
# +52%.  Numbers: scripts/bench_bf16.py, recorded in BENCH_SCALING.md.
MATMUL_PRECISION = jax.lax.Precision.HIGH


def block_input_len(n_frames: int, hop: int, fft_size: int) -> int:
    """Raw IQ samples needed to produce ``n_frames`` channelizer outputs."""
    return (n_frames - 1) * hop + fft_size


def make_frames(x: jax.Array, hop: int, fft_size: int, n_frames: int) -> jax.Array:
    """[L, ...] -> [n_frames, fft_size, ...] overlapped frames, frame g
    starting at g*hop.  Built from q = ceil(N/hop) shifted strided views; no
    gather.  Trailing dims (e.g. the IQ pair dim) pass through."""
    q = -(-fft_size // hop)  # ceil
    need = (n_frames + q) * hop
    if x.shape[0] < need:
        pad = jnp.zeros((need - x.shape[0],) + x.shape[1:], dtype=x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    else:
        x = x[:need]
    rows = x.reshape((n_frames + q, hop) + x.shape[1:])
    parts = [rows[i : i + n_frames] for i in range(q)]
    return jnp.concatenate(parts, axis=1)[:, :fft_size]


def make_taps(bins: jax.Array, window: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Matched-filter taps (computed in-jit so AFC bin moves need no host
    rebuild): taps[c, n] = window[n] * exp(-2πi * bin_c * n / N).

    Returns (real, imag) each [C, N] float32.
    """
    n = window.shape[0]
    # bin*k mod N keeps angles in [0, 2π) for full f32 precision; int32 is
    # safe: bin*k <= 8192^2 < 2^31 at the max supported fft size.
    phase_idx = (bins[:, None].astype(jnp.int32) * jnp.arange(n, dtype=jnp.int32)[None, :]) % n
    ang = (-2.0 * np.pi / n) * phase_idx.astype(jnp.float32)
    w = window[None, :].astype(jnp.float32)
    return jnp.cos(ang) * w, jnp.sin(ang) * w


@partial(jax.jit, static_argnames=("hop", "fft_size", "n_frames"))
def channelize_matmul(x: jax.Array, bins: jax.Array, window: jax.Array, *, hop: int, fft_size: int, n_frames: int, taps: tuple[jax.Array, jax.Array] | None = None) -> tuple[jax.Array, jax.Array]:
    """Windowed DFT at C bins via MXU matmul.

    x: [L, 2] f32 baseband block (re/im pairs); bins: [C] int32; window: [N] f32.
    Returns (mags [n_frames, C] f32, iq [n_frames, C, 2] f32).

    ``taps``: optional precomputed ``make_taps(bins, window)`` result.  Bins
    change only on AFC/scan retune, so streaming callers precompute taps once
    per retune instead of paying the [C, N] sincos every block (~0.6 ms at
    C=8192, N=512 on v5e).
    """
    frames = make_frames(x, hop, fft_size, n_frames)  # [W, N, 2]
    fr, fi = frames[..., 0], frames[..., 1]
    tr, ti = taps if taps is not None else make_taps(bins, window)
    # (fr + i·fi) @ (tr + i·ti)^T
    dot = partial(jnp.dot, precision=MATMUL_PRECISION)
    yr = dot(fr, tr.T) - dot(fi, ti.T)
    yi = dot(fr, ti.T) + dot(fi, tr.T)
    mags = jnp.sqrt(yr * yr + yi * yi)
    return mags, jnp.stack([yr, yi], axis=-1)


@partial(jax.jit, static_argnames=("hop", "fft_size", "n_frames"))
def channelize_fft(x: jax.Array, bins: jax.Array, window: jax.Array, *, hop: int, fft_size: int, n_frames: int) -> tuple[jax.Array, jax.Array]:
    """Batched-FFT channelizer: full [n_frames, N] spectra, then bin gather.
    Complex exists only transiently inside the program."""
    frames = make_frames(x, hop, fft_size, n_frames) * window[None, :, None]
    spec = jnp.fft.fft(jax.lax.complex(frames[..., 0], frames[..., 1]))
    sel = spec[:, bins]
    yr, yi = jnp.real(sel).astype(jnp.float32), jnp.imag(sel).astype(jnp.float32)
    return jnp.sqrt(yr * yr + yi * yi), jnp.stack([yr, yi], axis=-1)


@partial(jax.jit, static_argnames=("hop", "fft_size", "n_frames"))
def last_frame_spectrum_power(x: jax.Array, window: jax.Array, *, hop: int, fft_size: int, n_frames: int) -> jax.Array:
    """|X|^2 of the final frame of the block — used by host-side AFC
    (reference: rtl_airband.cpp:180-251 hill-climbs adjacent FFT bins using
    the most recent FFT output)."""
    start = (n_frames - 1) * hop
    frame = jax.lax.dynamic_slice(x, (start, 0), (fft_size, 2)) * window[:, None]
    spec = jnp.fft.fft(jax.lax.complex(frame[:, 0], frame[:, 1]))
    return (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2).astype(jnp.float32)


def decode_raw_iq(raw: jax.Array, sfmt: str, fullscale: float) -> jax.Array:
    """On-device sample-format decode to f32 IQ pairs (reference LUT/scale
    semantics, rtl_airband.cpp:316-324,402-455 — all four formats are affine
    so no LUT is needed on TPU).

    raw: u8 [2L] (u8/s8), int16 [2L], or f32 [2L] interleaved IQ.
    Returns [L, 2] float32.
    """
    if sfmt == "u8":
        # divide (not multiply-by-reciprocal): bit-identical to the host LUT
        # (ops/sampleconv.make_u8_lut), which the golden chain is pinned to
        v = (raw.astype(jnp.float32) - 127.5) / 127.5
    elif sfmt == "s8":
        v = raw.astype(jnp.int8).astype(jnp.float32) * (1.0 / 128.0)
    elif sfmt == "s16":
        v = raw.astype(jnp.float32) * (1.0 / fullscale)
    elif sfmt == "f32":
        v = raw.astype(jnp.float32) * (1.0 / fullscale)
    else:
        raise ValueError(f"unknown sample format {sfmt}")
    return v.reshape(-1, 2)
