"""Fused per-sample demodulation kernel (JAX scan over time, vectorized over channels).

This is the TPU-native replacement for the reference's scalar per-channel
loop (reference: src/rtl_airband.cpp:495-648 plus the squelch / CTCSS /
filter classes it drives).  All per-sample recurrences — the 5-state squelch
FSM (src/squelch.cpp), moving averages, the 102-slot pre/post comparison ring,
the AGC_EXTRA=100-sample wavein delay line, gated derotation with the 24-bit
phase accumulator (src/rtl_airband.cpp:510-517), complex Bessel lowpass and
audio notch biquads (src/filters.cpp), the dual Goertzel CTCSS banks
(src/ctcss.cpp), AM envelope AGC and NFM discriminator + de-emphasis — run in
one ``lax.scan`` whose carry is a pytree of [*, C]-shaped states, so thousands
of channels advance in lockstep on the VPU.

Design notes (vs. the reference's sequential C++):
 - branches become masked ``where`` updates; *state only advances where the
   reference would have executed the branch* (e.g. lowpass state only moves
   when ``should_filter_sample()``), which reproduces gating semantics, not
   just gated outputs;
 - the squelch-level lazy cache (squelch.cpp:169-177) is replaced by eager
   recomputation — equivalent because the reference invalidates the cache at
   every point its inputs change;
 - the ring buffers use shift-append form (concat(buf[1:], new)) so "oldest"
   is always row 0 — no per-step rotating indices;
 - the AM squelch-open AGC bootstrap (rtl_airband.cpp:534-540), a sequential
   fold over the 100-sample look-back window, is evaluated in closed form via
   a reversed cumulative count (a' = a·0.9^m + 0.1·Σ v_i·m_i·0.9^{suffix_i});
 - the squelch-close fade-out (rtl_airband.cpp:542-546) rewrites up to 99
   already-emitted samples; fades from different closes are ≥197 samples
   apart, so they are applied post-scan with a depthwise convolution.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AGC_EXTRA
from ..ops.filters import design_bessel_lowpass, design_notch
from ..ops.goertzel import FAST_WINDOW_SEC, MAX_TONES, SLOW_WINDOW_SEC, build_tone_bank
from ..ops.sincos import compute_dm_dphi, make_sincos_tables

F32 = jnp.float32

# Squelch states (reference: squelch.h:104-110)
CLOSED, OPENING, CLOSING, LSA, OPEN = 0, 1, 2, 3, 4

# Hardcoded squelch parameters (reference: squelch.cpp:49-70)
OPEN_DELAY = 197
CLOSE_DELAY = 197
LOW_SIGNAL_ABORT = 88
RECENT_SAMPLE_SIZE = 1000
FLAP_OPENS_THRESHOLD = 3
SQ_BUF = 102
PRE_VS_POST = np.float32(0.9)

MA_DECAY = np.float32(0.99)
MA_NEW = np.float32(1.0) - MA_DECAY
NF_DECAY = np.float32(0.97)
NF_NEW = np.float32(1.0) - NF_DECAY
NF_BIAS = np.float32(1e-6)

_PI4 = np.float32(np.pi / 4)
_PI34 = np.float32(3 * np.pi / 4)
_M1PI = np.float32(1.0 / np.pi)


class ChannelParams(NamedTuple):
    """Static per-channel parameters, all [C] (or [T, C]) device arrays."""

    is_nfm: jax.Array  # bool
    needs_raw_iq: jax.Array  # bool
    has_iq_outputs: jax.Array  # bool
    dm_dphi: jax.Array  # uint32
    alpha: jax.Array  # f32 (NFM de-emphasis)
    ampfactor: jax.Array  # f32
    # squelch config
    using_manual: jax.Array  # bool
    manual_level: jax.Array  # f32
    normal_ratio: jax.Array  # f32
    flappy_ratio: jax.Array  # f32
    # lowpass (complex Bessel biquad)
    lp_enabled: jax.Array  # bool
    lp_gain: jax.Array  # f32
    lp_y0: jax.Array  # f32
    lp_y1: jax.Array  # f32
    # notch biquad
    notch_enabled: jax.Array  # bool
    notch_d0: jax.Array
    notch_d1: jax.Array
    notch_d2: jax.Array
    # CTCSS banks [T, C]
    ctcss_enabled: jax.Array  # bool [C]
    fast_coeff: jax.Array  # f32 [T, C]
    fast_mask: jax.Array  # bool [T, C]
    fast_window: jax.Array  # i32 [C]
    fast_ntones: jax.Array  # f32 [C]
    slow_coeff: jax.Array
    slow_mask: jax.Array
    slow_window: jax.Array
    slow_ntones: jax.Array
    # sincos LUT (shared)
    sin_lut: jax.Array  # [257]
    cos_lut: jax.Array  # [257]


class CtcssState(NamedTuple):
    q1: jax.Array  # f32 [T, C]
    q2: jax.Array  # f32 [T, C]
    count: jax.Array  # i32 [C]
    enough: jax.Array  # bool [C]
    has_tone: jax.Array  # bool [C]
    found: jax.Array  # i32 [C]
    not_found: jax.Array  # i32 [C]


class DemodState(NamedTuple):
    """Carried state, threaded between blocks (and between scan steps)."""

    # squelch
    noise_floor: jax.Array
    pre_full: jax.Array
    pre_capped: jax.Array
    post_full: jax.Array
    post_capped: jax.Array
    using_post_filter: jax.Array  # bool
    cur: jax.Array  # i32
    nxt: jax.Array  # i32
    delay: jax.Array  # i32
    low_signal_count: jax.Array  # i32
    sample_count: jax.Array  # i32
    open_count: jax.Array
    flappy_count: jax.Array
    recent_open_count: jax.Array
    closed_sample_count: jax.Array
    sq_buffer: jax.Array  # f32 [SQ_BUF, C], row 0 oldest
    # filters
    lp_xr: jax.Array  # f32 [3, C]
    lp_xi: jax.Array
    lp_yr: jax.Array
    lp_yi: jax.Array
    notch_x: jax.Array  # f32 [3, C]
    notch_y: jax.Array
    # demod
    agc: jax.Array  # f32 (agcavgfast)
    dm_phi: jax.Array  # uint32
    pr: jax.Array
    pj: jax.Array
    prev_waveout: jax.Array
    # ctcss
    fast: CtcssState
    slow: CtcssState
    # block-carry delay lines
    wavein_delay: jax.Array  # f32 [AGC_EXTRA, C], row 0 oldest (modified wavein)
    iq_tail: jax.Array  # f32 [AGC_EXTRA, C, 2] unconsumed channelizer IQ
    waveout_tail: jax.Array  # f32 [AGC_EXTRA, C]


def _levels(p: ChannelParams, nf, roc):
    """Eager squelch_level() (reference: squelch.cpp:169-177)."""
    flapping = roc >= FLAP_OPENS_THRESHOLD
    ratio = jnp.where(flapping & (p.flappy_ratio < p.normal_ratio), p.flappy_ratio, p.normal_ratio)
    return jnp.where(p.using_manual, p.manual_level, ratio * nf)


def _set_state_valid(cur, upd):
    """Transition-validity table (reference: squelch.cpp:297-361)."""
    u = upd if isinstance(upd, jax.Array) else jnp.full_like(cur, upd)
    u = jnp.where((cur == CLOSED) & ((u == CLOSING) | (u == LSA)), CLOSED, u)
    u = jnp.where((cur == CLOSED) & (u == OPEN), OPENING, u)
    u = jnp.where((cur == OPENING) & (u == LSA), CLOSED, u)
    u = jnp.where((cur == LSA) & (u != LSA) & (u != CLOSED), CLOSED, u)
    u = jnp.where((cur == OPEN) & (u == CLOSED), CLOSING, u)
    u = jnp.where((cur == OPEN) & (u == OPENING), OPEN, u)
    return u


def _fast_atan2(y, x):
    """reference: rtl_airband.cpp:147-166."""
    yabs = jnp.abs(y)
    pos = x >= 0.0
    angle = jnp.where(pos, _PI4 - _PI4 * (x - yabs) / (x + yabs), _PI34 - _PI4 * (x + yabs) / (yabs - x))
    angle = jnp.where(y < 0.0, -angle, angle)
    return jnp.where((x == 0.0) & (y == 0.0), F32(0.0), angle)


def _ctcss_bank_step(ct: CtcssState, coeff, mask, window, ntones, sample, advance, reset):
    """One Goertzel-bank sample (reference: ctcss.cpp:44-61,124-163)."""
    q1 = jnp.where(reset[None, :], 0.0, ct.q1)
    q2 = jnp.where(reset[None, :], 0.0, ct.q2)
    count = jnp.where(reset, 0, ct.count)
    enough = jnp.where(reset, False, ct.enough)
    has_tone = jnp.where(reset, False, ct.has_tone)

    q0 = coeff * q1 - q2 + sample[None, :]
    q2n = jnp.where(advance[None, :], q1, q2)
    q1n = jnp.where(advance[None, :], q0, q1)
    countn = jnp.where(advance, count + 1, count)
    latch = advance & (countn >= window)

    power = q1n * q1n + q2n * q2n - q1n * q2n * coeff
    powm = jnp.where(mask, power, -jnp.inf)
    maxp = jnp.max(powm, axis=0)
    avg = jnp.sum(jnp.where(mask, power, 0.0), axis=0) / ntones
    detected = (power[0] == maxp) & (power[0] > avg)

    has_tone2 = jnp.where(latch, detected, has_tone)
    enough2 = enough | latch
    found2 = ct.found + jnp.where(latch & detected, 1, 0)
    nfound2 = ct.not_found + jnp.where(latch & ~detected, 1, 0)
    q1f = jnp.where(latch[None, :], 0.0, q1n)
    q2f = jnp.where(latch[None, :], 0.0, q2n)
    countf = jnp.where(latch, 0, countn)
    return CtcssState(q1f, q2f, countf, enough2, has_tone2, found2, nfound2)


def _scan_step(p: ChannelParams, st: DemodState, mag, in_r, in_i, fm_quadri: bool, with_ctcss: bool):
    s = mag  # raw squelch sample

    # ======== Squelch::update_current_state (squelch.cpp:363-460) ========
    cur, nxt = st.cur, st.nxt
    buf_old = st.sq_buffer[0]  # age-102 value (pre-append)

    is_A = nxt == OPENING
    A1 = is_A & (cur != OPENING)
    A2 = is_A & ~A1
    is_B = nxt == CLOSING
    B1 = is_B & (cur != CLOSING)
    B2 = is_B & ~B1
    is_C = nxt == LSA
    C1 = is_C & (cur != LSA)
    C2 = is_C & ~C1
    is_D = (nxt == OPEN) & (cur != OPEN)
    is_E = (nxt == CLOSED) & (cur != CLOSED)
    is_F = (nxt == CLOSED) & (cur == CLOSED)
    is_else = (nxt == OPEN) & (cur == OPEN)

    delay1 = jnp.where(A1 | B1 | (C1 & (cur != CLOSING)), 0, jnp.where(A2 | B2 | C2, st.delay + 1, st.delay))

    a2_fire = A2 & (delay1 >= OPEN_DELAY)
    a2_count = a2_fire & (st.closed_sample_count < RECENT_SAMPLE_SIZE)
    roc1 = st.recent_open_count + a2_count.astype(jnp.int32)
    flappy_count1 = st.flappy_count + (a2_count & (roc1 >= FLAP_OPENS_THRESHOLD)).astype(jnp.int32)

    def hassig(roc):
        lvl = _levels(p, st.noise_floor, roc)
        return (st.pre_capped >= lvl) & (~st.using_post_filter | (st.post_capped >= buf_old))

    hasA = hassig(roc1)
    hasB = hassig(st.recent_open_count)

    b2_fire = B2 & (delay1 >= CLOSE_DELAY)
    c2_fire = C2 & (delay1 >= CLOSE_DELAY)

    cur1 = cur
    cur1 = jnp.where(A1, OPENING, cur1)
    cur1 = jnp.where(B1, CLOSING, cur1)
    cur1 = jnp.where(b2_fire & hasB, OPEN, cur1)  # revert to OPEN w/o open_count++
    cur1 = jnp.where(C1, LSA, cur1)
    cur1 = jnp.where(is_D, OPEN, cur1)
    cur1 = jnp.where(is_E, CLOSED, cur1)
    cur1 = jnp.where(is_else, nxt, cur1)

    nxt1 = nxt
    nxt1 = jnp.where(a2_fire, jnp.where(hasA, OPEN, CLOSED), nxt1)
    nxt1 = jnp.where(b2_fire, jnp.where(hasB, OPEN, CLOSED), nxt1)
    nxt1 = jnp.where(c2_fire, CLOSED, nxt1)

    lsc1 = jnp.where(A1, 0, st.low_signal_count)
    upf1 = st.using_post_filter & ~(A1 | is_E)
    open_count1 = st.open_count + is_D.astype(jnp.int32)
    roc1 = jnp.where(is_F & (st.closed_sample_count == RECENT_SAMPLE_SIZE), 0, roc1)
    csc1 = jnp.where(is_E, 0, st.closed_sample_count)
    csc1 = jnp.where(is_F & (st.closed_sample_count < RECENT_SAMPLE_SIZE), st.closed_sample_count + 1, csc1)
    # masked by ctcss_enabled: disabled channels' bank state is all-zero
    # either way (they never advance), and the mask lets the Pallas kernel's
    # per-tile event gate skip CTCSS-free tiles on squelch-close events
    ctcss_reset = is_E & p.ctcss_enabled

    # ======== process_raw_sample rest (squelch.cpp:196-246) ========
    sample_count1 = st.sample_count + 1
    do_nf = (sample_count1 % 16) == 0
    nf1 = jnp.where(do_nf, st.noise_floor * NF_DECAY + jnp.minimum(st.pre_capped, st.noise_floor) * NF_NEW + NF_BIAS, st.noise_floor)
    cap = F32(1.5) * jnp.where(p.using_manual, p.manual_level, p.normal_ratio * nf1)

    pre_full1 = st.pre_full * MA_DECAY + s * MA_NEW
    pre_capped1 = jnp.where(
        (st.pre_capped >= cap) & (s >= cap), cap, jnp.minimum(cap, st.pre_capped * MA_DECAY + s * MA_NEW)
    )
    sq_buffer1 = jnp.concatenate([st.sq_buffer[1:], (pre_capped1 * PRE_VS_POST)[None, :]], axis=0)
    buf_tail = sq_buffer1[0]  # age-101 value

    lvl1 = _levels(p, nf1, roc1)
    has_pre = pre_capped1 >= lvl1
    has_sig = has_pre & (~upf1 | (st.post_capped >= buf_tail))

    nxt2 = jnp.where((cur1 == OPEN) & ~has_sig, _set_state_valid(cur1, CLOSING), nxt1)
    nxt2 = jnp.where((cur1 == CLOSED) & has_sig, _set_state_valid(cur1, OPENING), nxt2)

    active = (cur1 != CLOSED) & (cur1 != LSA)
    below = s < lvl1
    lsc2 = jnp.where(active, jnp.where(below, lsc1 + 1, 0), lsc1)
    lsa_fire = active & below & (lsc2 >= LOW_SIGNAL_ABORT)
    nxt3 = jnp.where(lsa_fire, _set_state_valid(cur1, LSA), nxt2)

    # ======== filtering path (rtl_airband.cpp:507-529) ========
    should_filter = (has_pre | (cur1 != CLOSED)) & (cur1 != LSA)
    do_filter = should_filter & p.needs_raw_iq

    idx = (st.dm_phi >> 16).astype(jnp.int32)
    fract = (st.dm_phi & jnp.uint32(0xFFFF)).astype(F32) / F32(65536.0)
    s1 = jnp.take(p.sin_lut, idx)
    s2 = jnp.take(p.sin_lut, idx + 1)
    c1 = jnp.take(p.cos_lut, idx)
    c2 = jnp.take(p.cos_lut, idx + 1)
    swf = s1 + (s2 - s1) * fract
    cwf = c1 + (c2 - c1) * fract
    # multiply(real, imag, cwf, -swf) (rtl_airband.cpp:141-144,513)
    re_d = in_r * cwf + in_i * swf
    im_d = in_i * cwf - in_r * swf
    dm_phi1 = jnp.where(do_filter, (st.dm_phi + p.dm_dphi) & jnp.uint32(0xFFFFFF), st.dm_phi)

    # complex Bessel lowpass biquad (filters.cpp:158-180); state advances only
    # when the reference would call apply() with enabled filter
    adv_lp = do_filter & p.lp_enabled
    x2r = re_d / p.lp_gain
    x2i = im_d / p.lp_gain
    lp_xr1 = jnp.where(adv_lp[None, :], jnp.stack([st.lp_xr[1], st.lp_xr[2], x2r]), st.lp_xr)
    lp_xi1 = jnp.where(adv_lp[None, :], jnp.stack([st.lp_xi[1], st.lp_xi[2], x2i]), st.lp_xi)
    y2r = (lp_xr1[0] + lp_xr1[2]) + F32(2.0) * lp_xr1[1] + p.lp_y0 * st.lp_yr[1] + p.lp_y1 * st.lp_yr[2]
    y2i = (lp_xi1[0] + lp_xi1[2]) + F32(2.0) * lp_xi1[1] + p.lp_y0 * st.lp_yi[1] + p.lp_y1 * st.lp_yi[2]
    lp_yr1 = jnp.where(adv_lp[None, :], jnp.stack([st.lp_yr[1], st.lp_yr[2], y2r]), st.lp_yr)
    lp_yi1 = jnp.where(adv_lp[None, :], jnp.stack([st.lp_yi[1], st.lp_yi[2], y2i]), st.lp_yi)

    filt_r = jnp.where(p.lp_enabled, y2r, re_d)
    filt_i = jnp.where(p.lp_enabled, y2i, im_d)
    real = jnp.where(do_filter, filt_r, in_r)
    imag = jnp.where(do_filter, filt_i, in_i)
    wavein_mod = jnp.where(do_filter, jnp.sqrt(real * real + imag * imag), s)

    # process_filtered_sample (squelch.cpp:248-276); called only when lowpass enabled
    pf = do_filter & p.lp_enabled
    opening = cur1 == OPENING
    skip = pf & opening & (delay1 < SQ_BUF)
    init_pf = pf & opening & (delay1 == SQ_BUF)
    post_full_b = jnp.where(init_pf, buf_tail, st.post_full)
    post_capped_b = jnp.where(init_pf, buf_tail, st.post_capped)
    eff = pf & ~skip
    upf2 = upf1 | eff
    post_full1 = jnp.where(eff, post_full_b * MA_DECAY + wavein_mod * MA_NEW, post_full_b)
    post_capped1 = jnp.where(
        eff,
        jnp.where((post_capped_b >= cap) & (wavein_mod >= cap), cap, jnp.minimum(cap, post_capped_b * MA_DECAY + wavein_mod * MA_NEW)),
        post_capped_b,
    )
    close_fire = eff & (post_capped1 < buf_tail)
    nxt4 = jnp.where(close_fire, _set_state_valid(cur1, CLOSED), nxt3)

    # ======== demod (rtl_airband.cpp:532-618) ========
    first_open = (cur1 != OPEN) & (nxt4 == OPEN)
    last_open = ((cur1 == CLOSING) & (nxt4 == CLOSED)) | ((cur1 != LSA) & (nxt4 == LSA))
    spa = (cur1 == OPEN) | (cur1 == CLOSING)
    is_am = ~p.is_nfm

    # AM squelch-open AGC bootstrap, closed form over the look-back window
    dl = st.wavein_delay  # [A, C], row 0 oldest
    selm = (dl >= lvl1[None, :]).astype(F32)
    rev = jnp.cumsum(selm[::-1], axis=0)[::-1]  # inclusive suffix counts
    suffix = rev - selm  # exclusive
    total = rev[0]
    boot = st.agc * jnp.power(F32(0.9), total) + F32(0.1) * jnp.sum(dl * selm * jnp.power(F32(0.9), suffix), axis=0)
    agc1 = jnp.where(first_open & is_am, boot, st.agc)

    env = dl[0]  # wavein[j - AGC_EXTRA]

    # AM envelope demod + AGC (rtl_airband.cpp:548-562)
    am_agc_up = spa & is_am & (wavein_mod > lvl1)
    agc_am = jnp.where(am_agc_up, agc1 * F32(0.995) + wavein_mod * F32(0.005), agc1)
    w_am = (env - agc_am) / (agc_am * F32(1.5))
    over = jnp.abs(w_am) > F32(0.8)
    w_am = jnp.where(over, w_am * F32(0.85), w_am)
    agc_am = jnp.where(spa & is_am & over, agc_am * F32(1.15), agc_am)

    # NFM discriminator + DC block + de-emphasis (rtl_airband.cpp:564-582)
    if fm_quadri:
        disc = (st.pr * imag - real * st.pj) / (real * real + imag * imag + F32(1.0)) * _M1PI
    else:
        cr = real * st.pr + imag * st.pj
        cj = imag * st.pr - real * st.pj
        disc = _fast_atan2(cj, cr) * _M1PI
    agc_nfm = agc1 * F32(0.995) + disc * F32(0.005)
    w_n = disc - agc_nfm
    w_n = w_n * (F32(1.0) - p.alpha) + st.prev_waveout * p.alpha

    nfm_adv = spa & p.is_nfm
    pr1 = jnp.where(nfm_adv, real, st.pr)
    pj1 = jnp.where(nfm_adv, imag, st.pj)
    prev1 = jnp.where(nfm_adv, w_n, st.prev_waveout)
    agc2 = jnp.where(spa, jnp.where(is_am, agc_am, agc_nfm), agc1)

    waveout = jnp.where(is_am, w_am, w_n)

    # ======== CTCSS (squelch.cpp:278-292, ctcss.cpp) ========
    if with_ctcss:
        adv_ct = spa & (cur1 != CLOSED) & p.ctcss_enabled
        slow1 = _ctcss_bank_step(st.slow, p.slow_coeff, p.slow_mask, p.slow_window, p.slow_ntones, waveout, adv_ct, ctcss_reset)
        adv_fast = adv_ct & ~slow1.enough
        fast1 = _ctcss_bank_step(st.fast, p.fast_coeff, p.fast_mask, p.fast_window, p.fast_ntones, waveout, adv_fast, ctcss_reset)
        gate = jnp.where(p.ctcss_enabled, jnp.where(slow1.enough, slow1.has_tone, fast1.has_tone), True)
    else:
        slow1, fast1 = st.slow, st.fast
        gate = jnp.ones_like(spa)

    open_now = spa & gate

    # ======== notch + ampfactor + clamp (rtl_airband.cpp:590-618) ========
    adv_notch = open_now & p.notch_enabled
    nx1 = jnp.where(adv_notch[None, :], jnp.stack([st.notch_x[1], st.notch_x[2], waveout]), st.notch_x)
    ny2 = p.notch_d0 * nx1[2] - p.notch_d1 * nx1[1] + p.notch_d0 * nx1[0] + p.notch_d1 * st.notch_y[2] - p.notch_d2 * st.notch_y[1]
    ny1 = jnp.where(adv_notch[None, :], jnp.stack([st.notch_y[1], st.notch_y[2], ny2]), st.notch_y)
    w3 = jnp.where(p.notch_enabled, ny2, waveout)
    w4 = w3 * p.ampfactor
    w5 = jnp.where(jnp.isnan(w4), F32(0.0), jnp.clip(w4, -1.0, 1.0))
    waveout_final = jnp.where(open_now, w5, F32(0.0))

    iq_out_r = jnp.where(open_now & p.has_iq_outputs, real, F32(0.0))
    iq_out_i = jnp.where(open_now & p.has_iq_outputs, imag, F32(0.0))

    dl1 = jnp.concatenate([dl[1:], wavein_mod[None, :]], axis=0)

    st1 = DemodState(
        noise_floor=nf1,
        pre_full=pre_full1,
        pre_capped=pre_capped1,
        post_full=post_full1,
        post_capped=post_capped1,
        using_post_filter=upf2,
        cur=cur1,
        nxt=nxt4,
        delay=delay1,
        low_signal_count=lsc2,
        sample_count=sample_count1,
        open_count=open_count1,
        flappy_count=flappy_count1,
        recent_open_count=roc1,
        closed_sample_count=csc1,
        sq_buffer=sq_buffer1,
        lp_xr=lp_xr1,
        lp_xi=lp_xi1,
        lp_yr=lp_yr1,
        lp_yi=lp_yi1,
        notch_x=nx1,
        notch_y=ny1,
        agc=agc2,
        dm_phi=dm_phi1,
        pr=pr1,
        pj=pj1,
        prev_waveout=prev1,
        fast=fast1,
        slow=slow1,
        wavein_delay=dl1,
        iq_tail=st.iq_tail,
        waveout_tail=st.waveout_tail,
    )
    out = dict(
        waveout=waveout_final,
        fade=(last_open & is_am),
        open_now=open_now,
        iq_out_r=iq_out_r,
        iq_out_i=iq_out_i,
        sig_outside=(upf2 & has_pre & ~(post_capped1 >= buf_tail)),
    )
    return st1, out


def apply_fade_and_tail(waveout_tail: jax.Array, waveout: jax.Array, fade: jax.Array):
    """Post-scan waveout assembly: AGC_EXTRA tail carry + AM squelch-close
    fade-out rewrites (reference: rtl_airband.cpp:542-546 rewrites up to 99
    already-emitted samples; closes are >= 197 samples apart so fade regions
    never overlap and one causal depthwise conv applies them all).

    waveout_tail: [A, C] carried tail; waveout: [W, C] scan output;
    fade: [W, C] bool, true where an AM squelch close fired.
    Returns (audio [W, C], new_tail [A, C]).
    """
    W, C = waveout.shape
    A = waveout_tail.shape[0]
    w_full = jnp.concatenate([waveout_tail, waveout], axis=0)  # [A+W, C]
    L = A + W
    fade_base = jnp.where(fade, w_full[:W], 0.0)  # base value at index n
    fade_mark = fade.astype(F32)
    # kernel length A: k[j] = 0.94^(A-1-j) for j=0..A-2 (i = A-1-j in 1..99), k[A-1]=0
    kvec = np.concatenate([np.power(np.float32(0.94), np.arange(A - 1, 0, -1, dtype=np.float32)), np.zeros(1, np.float32)])

    def causal_conv(x_wc, kern_vec):
        x_ncw = jnp.pad(x_wc, ((0, L - x_wc.shape[0]), (0, 0))).T[None, :, :]  # [1, C, L]
        kern = jnp.tile(jnp.asarray(kern_vec)[None, None, :], (C, 1, 1))  # [C, 1, A]
        y = jax.lax.conv_general_dilated(
            x_ncw, kern, window_strides=(1,), padding=[(A - 1, 0)],
            feature_group_count=C, dimension_numbers=("NCW", "OIW", "NCW"),
        )
        return y[0].T  # [L, C]: y[m] = Σ_{i=1..A-1} x[m-i]·0.94^i

    contrib = causal_conv(fade_base, kvec)
    region = causal_conv(fade_mark, np.concatenate([np.ones(A - 1, np.float32), np.zeros(1, np.float32)]))
    w_full = jnp.where(region > 0, contrib, w_full)
    return w_full[:W], w_full[W:]


@partial(jax.jit, static_argnames=("fm_quadri", "with_ctcss", "trace"))
def demod_block(
    params: ChannelParams,
    state: DemodState,
    mags: jax.Array,  # [W, C] new channelizer magnitudes (buffer idx AGC_EXTRA..W+AGC_EXTRA)
    iqs: jax.Array,  # [W, C, 2] f32 new channelizer bin IQ (same indices)
    *,
    fm_quadri: bool = False,
    with_ctcss: bool = True,
    trace: bool = False,
):
    """Process one WAVE_BATCH block for all channels.

    Returns (new_state, audio [W, C], iq_out [W, C, 2] f32, open_flags [W, C]).
    """
    W, C = mags.shape
    A = AGC_EXTRA

    # The per-sample loop consumes IQ with an AGC_EXTRA lag (iq_in[j - A],
    # rtl_airband.cpp:497-498): prepend the carried tail.
    iq_stream = jnp.concatenate([state.iq_tail, iqs[: W - A]], axis=0)
    new_iq_tail = iqs[W - A :]

    xs = dict(mag=mags, in_r=iq_stream[..., 0], in_i=iq_stream[..., 1])

    def body(st, x):
        st1, out = _scan_step(params, st, x["mag"], x["in_r"], x["in_i"], fm_quadri, with_ctcss)
        if trace:
            out = dict(out, cur=st1.cur, nxt=st1.nxt, nf=st1.noise_floor, pre_capped=st1.pre_capped, agc=st1.agc, delay=st1.delay)
        return st1, out

    state1, outs = jax.lax.scan(body, state, xs)

    # ---- waveout assembly: tail carry + AM fade-out rewrites ----
    # Fade at scan step n (full buffer index p = n + A) rewrites full indices
    # p-99..p-1 with w_full[p-100] * 0.94^i, i.e. full index n+i gets
    # w_full[n] * 0.94^i for i = 1..99 (rtl_airband.cpp:542-546).
    audio, new_tail = apply_fade_and_tail(state.waveout_tail, outs["waveout"], outs["fade"])
    iq_out = jnp.stack([outs["iq_out_r"], outs["iq_out_i"]], axis=-1)

    state2 = state1._replace(iq_tail=new_iq_tail, waveout_tail=new_tail)
    if trace:
        return state2, audio, iq_out, outs["open_now"], {kk: outs[kk] for kk in ("cur", "nxt", "nf", "pre_capped", "agc", "delay", "waveout")}
    return state2, audio, iq_out, outs["open_now"]
