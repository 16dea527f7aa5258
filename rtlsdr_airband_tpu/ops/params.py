"""Host-side construction of ChannelParams / DemodState from channel configs.

Builds the [C]-vectorized parameter arrays consumed by ops.demod from
per-channel configuration (the same fields parse_channels fills in the
reference: config.cpp:306-726).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..constants import AGC_EXTRA
from ..ops.demod import CLOSED, MAX_TONES, ChannelParams, CtcssState, DemodState, SQ_BUF
from ..ops.filters import design_bessel_lowpass, design_notch
from ..ops.goertzel import build_ctcss_banks
from ..ops.levels import dbfs_to_level
from ..ops.sincos import compute_dm_dphi, make_sincos_tables


@dataclass
class ChannelSpec:
    """One demodulated channel (mirrors the reference's channel+freq config,
    config.cpp:306-726)."""

    frequency: int = 0
    modulation: str = "am"  # 'am' | 'nfm'
    label: str | None = None
    ampfactor: float = 1.0
    bandwidth: float = 0.0  # lowpass bandwidth Hz (0 = disabled)
    notch: float = 0.0
    notch_q: float = 10.0
    ctcss: float = 0.0
    squelch_threshold_dbfs: float | None = None  # manual (dBFS)
    squelch_snr_threshold_db: float | None = None
    has_iq_outputs: bool = False
    tau_us: float | None = None
    afc: int = 0

    @property
    def needs_raw_iq(self) -> bool:
        return self.modulation == "nfm" or self.bandwidth > 0 or self.has_iq_outputs


def cost_group_permutation(specs: list[ChannelSpec]) -> np.ndarray:
    """Stable permutation grouping channels by DSP cost class.

    The Pallas demod kernel event-gates its most expensive per-sample work —
    the 52-tone dual Goertzel CTCSS bank (~+35% block time) — with a
    per-channel-tile ``pl.when``, so the gate only pays off when a whole tile
    shares the feature.  Grouping CTCSS channels (and, secondarily, the other
    gated features) into contiguous runs lets mixed populations skip the bank
    on CTCSS-free tiles.  Order within a class is preserved (stable sort);
    callers inverse-permute per-channel outputs back to user order.
    """
    key = np.array(
        [
            ((s.ctcss > 0) << 3) | (s.needs_raw_iq << 2) | ((s.modulation == "nfm") << 1) | (s.notch > 0)
            for s in specs
        ],
        np.int64,
    )
    return np.argsort(key, kind="stable").astype(np.int32)


def make_channel_params(
    specs: list[ChannelSpec],
    *,
    wave_rate: int,
    sample_rate: int,
    center_freq: int,
    fft_size: int,
) -> ChannelParams:
    C = len(specs)
    T = MAX_TONES

    def arr(fn, dtype=np.float32):
        return jnp.asarray(np.array([fn(s) for s in specs], dtype=dtype))

    is_nfm = arr(lambda s: s.modulation == "nfm", bool)
    needs_raw_iq = arr(lambda s: s.needs_raw_iq, bool)
    has_iq_outputs = arr(lambda s: s.has_iq_outputs, bool)
    dm_dphi = arr(lambda s: (compute_dm_dphi(s.frequency, center_freq, sample_rate, wave_rate) & 0xFFFFFF) if s.needs_raw_iq else 0, np.uint32)

    def alpha_of(s: ChannelSpec) -> float:
        tau = 200.0 if s.tau_us is None else s.tau_us
        return 0.0 if tau == 0 else float(np.exp(-1.0 / (wave_rate * 1e-6 * tau)))

    alpha = arr(alpha_of)
    ampfactor = arr(lambda s: s.ampfactor)

    using_manual = arr(lambda s: s.squelch_threshold_dbfs is not None, bool)
    manual_level = arr(lambda s: dbfs_to_level(s.squelch_threshold_dbfs, fft_size) if s.squelch_threshold_dbfs is not None else -1.0)
    snr_db = [9.54 if s.squelch_snr_threshold_db is None else s.squelch_snr_threshold_db for s in specs]
    normal_ratio = jnp.asarray(np.array([np.float32(10.0 ** (db / 20.0)) for db in snr_db], dtype=np.float32))
    flappy_ratio = normal_ratio * np.float32(0.9)

    lp = [design_bessel_lowpass(s.bandwidth / 2.0 if s.bandwidth > 0 else 0.0, wave_rate) for s in specs]
    notch = [design_notch(s.notch, wave_rate, s.notch_q) for s in specs]

    fastc = np.zeros((T, C), np.float32)
    fastm = np.zeros((T, C), bool)
    fastw = np.ones(C, np.int32)
    fastn = np.ones(C, np.float32)
    slowc = np.zeros((T, C), np.float32)
    slowm = np.zeros((T, C), bool)
    sloww = np.ones(C, np.int32)
    slown = np.ones(C, np.float32)
    ctcss_en = np.zeros(C, bool)
    for i, s in enumerate(specs):
        if s.ctcss > 0:
            fast, slow = build_ctcss_banks(s.ctcss, wave_rate)
            ctcss_en[i] = True
            fastc[:, i] = fast.coeffs
            fastm[:, i] = fast.mask
            fastw[i] = fast.window_size
            fastn[i] = fast.mask.sum()
            slowc[:, i] = slow.coeffs
            slowm[:, i] = slow.mask
            sloww[i] = slow.window_size
            slown[i] = slow.mask.sum()

    sin_lut, cos_lut = make_sincos_tables()

    return ChannelParams(
        is_nfm=is_nfm,
        needs_raw_iq=needs_raw_iq,
        has_iq_outputs=has_iq_outputs,
        dm_dphi=dm_dphi,
        alpha=alpha,
        ampfactor=ampfactor,
        using_manual=using_manual,
        manual_level=manual_level,
        normal_ratio=normal_ratio,
        flappy_ratio=flappy_ratio,
        lp_enabled=jnp.asarray(np.array([f.enabled for f in lp])),
        lp_gain=jnp.asarray(np.array([f.gain for f in lp], np.float32)),
        lp_y0=jnp.asarray(np.array([f.ycoeff0 for f in lp], np.float32)),
        lp_y1=jnp.asarray(np.array([f.ycoeff1 for f in lp], np.float32)),
        notch_enabled=jnp.asarray(np.array([f.enabled for f in notch])),
        notch_d0=jnp.asarray(np.array([f.d0 for f in notch], np.float32)),
        notch_d1=jnp.asarray(np.array([f.d1 for f in notch], np.float32)),
        notch_d2=jnp.asarray(np.array([f.d2 for f in notch], np.float32)),
        ctcss_enabled=jnp.asarray(ctcss_en),
        fast_coeff=jnp.asarray(fastc),
        fast_mask=jnp.asarray(fastm),
        fast_window=jnp.asarray(fastw),
        fast_ntones=jnp.asarray(fastn),
        slow_coeff=jnp.asarray(slowc),
        slow_mask=jnp.asarray(slowm),
        slow_window=jnp.asarray(sloww),
        slow_ntones=jnp.asarray(slown),
        sin_lut=jnp.asarray(sin_lut),
        cos_lut=jnp.asarray(cos_lut),
    )


def init_demod_state(C: int, prime_mags, prime_iqs) -> DemodState:
    """Initial carried state (reference inits: squelch.cpp:36-84,
    config.cpp:270-330).  ``prime_mags`` [A, C] / ``prime_iqs`` [A, C, 2] are the first
    AGC_EXTRA channelizer outputs that seed the wavein delay line and IQ tail —
    the reference's first batch fills buffer indices [0, AGC_EXTRA) before the
    per-sample loop starts reading at j = AGC_EXTRA."""
    A = AGC_EXTRA
    f = lambda v: jnp.full((C,), v, jnp.float32)
    i = lambda v: jnp.full((C,), v, jnp.int32)
    b = lambda v: jnp.full((C,), v, bool)

    def ct():
        return CtcssState(
            q1=jnp.zeros((MAX_TONES, C), jnp.float32),
            q2=jnp.zeros((MAX_TONES, C), jnp.float32),
            count=i(0),
            enough=b(False),
            has_tone=b(False),
            found=i(0),
            not_found=i(0),
        )

    return DemodState(
        noise_floor=f(5.0),
        pre_full=f(0.001),
        pre_capped=f(0.001),
        post_full=f(0.001),
        post_capped=f(0.001),
        using_post_filter=b(False),
        cur=i(CLOSED),
        nxt=i(CLOSED),
        delay=i(0),
        low_signal_count=i(0),
        sample_count=i(-1),
        open_count=i(0),
        flappy_count=i(0),
        recent_open_count=i(0),
        closed_sample_count=i(0),
        sq_buffer=jnp.zeros((SQ_BUF, C), jnp.float32),
        lp_xr=jnp.zeros((3, C), jnp.float32),
        lp_xi=jnp.zeros((3, C), jnp.float32),
        lp_yr=jnp.zeros((3, C), jnp.float32),
        lp_yi=jnp.zeros((3, C), jnp.float32),
        notch_x=jnp.zeros((3, C), jnp.float32),
        notch_y=jnp.zeros((3, C), jnp.float32),
        agc=f(0.5),
        dm_phi=jnp.zeros((C,), jnp.uint32),
        pr=f(0.0),
        pj=f(0.0),
        prev_waveout=f(0.5),
        fast=ct(),
        slow=ct(),
        wavein_delay=jnp.asarray(prime_mags, jnp.float32),
        iq_tail=jnp.asarray(prime_iqs, jnp.float32),
        waveout_tail=jnp.full((A, C), 0.5, jnp.float32),
    )
