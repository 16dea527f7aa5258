"""Pallas TPU kernel for the fused per-sample demodulation scan.

Same semantics as :func:`rtlsdr_airband_tpu.ops.demod.demod_block` (the XLA
``lax.scan`` reference implementation of the per-sample loop, reference:
src/rtl_airband.cpp:495-648 + squelch.cpp/ctcss.cpp/filters.cpp), but as a
single Mosaic kernel:

 - channels are tiled (sublanes x 128 lanes) per grid step — 8x128=1024 for
   small populations, up to 32x128=4096 for large ones: the loop is
   latency-bound, so wider tiles ride the VPU pipeline at no extra wall
   time (measured ~4x throughput at 4096-channel tiles on v5e);
 - ALL recurrent state (squelch FSM, moving averages, AGC, biquads, Goertzel
   banks, the 102-slot pre/post ring and the 100-sample wavein delay line)
   lives in VMEM scratch for the whole block - zero HBM traffic per step,
   where the XLA scan rematerializes multi-MB carries through HBM every
   sample (~100x slower measured on v5e);
 - ring buffers use rotating write positions (O(1)/step) instead of the
   scan's shift-append (O(len)/step), and are un-rotated into canonical
   row-0-oldest order once per block so the state pytree stays
   interchangeable with the XLA path;
 - the rare expensive events - AM squelch-open AGC bootstrap over the
   100-sample look-back (rtl_airband.cpp:534-540) and the CTCSS Goertzel
   window decision (ctcss.cpp:138-158) - run under ``pl.when`` so their cost
   is paid only on the samples where the reference would execute them;
 - the derotator's interpolated 256-entry sin/cos LUT (util.cpp:103-127) is
   reproduced by evaluating sin/cos at the quantized table angles in-kernel
   (Mosaic has no 1-D gather); the table values agree with the precomputed
   LUT to ~1e-7 and the 24-bit fixed-point phase accumulator is integer-exact
   (kept in int32: all values < 2^25), so there is no phase drift.

Numerical parity vs the XLA scan: integer/bool state and squelch decisions
are expected to match exactly; float audio to ~1e-4 (trig table evaluation
and the AGC bootstrap, which here is the reference's sequential fold rather
than the scan's closed form - closer to the C++ than the XLA path is).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import AGC_EXTRA
from .demod import (
    CLOSE_DELAY,
    CLOSED,
    CLOSING,
    FLAP_OPENS_THRESHOLD,
    LOW_SIGNAL_ABORT,
    LSA,
    MA_DECAY,
    MA_NEW,
    NF_BIAS,
    NF_DECAY,
    NF_NEW,
    OPEN,
    OPEN_DELAY,
    OPENING,
    PRE_VS_POST,
    RECENT_SAMPLE_SIZE,
    SQ_BUF,
    ChannelParams,
    CtcssState,
    DemodState,
    _M1PI,
    _PI4,
    _PI34,
    apply_fade_and_tail,
)
from .goertzel import MAX_TONES

F32 = jnp.float32
I32 = jnp.int32

LANE = 128


def _tile_shape(C: int) -> tuple[int, int]:
    """(sublanes, channels-per-tile).  The per-sample loop is latency-bound,
    not throughput-bound: measured on v5e, a (32,128) elementwise op chain
    costs the same wall time per step as (8,128) — wider tiles ride the VPU
    pipeline for free — so large channel counts use 4096-channel tiles.
    (64-sublane tiles were probed in round 4 — scripts/bench_tile.py — and
    RTLSDR_DEMOD_SUBL overrides for experiments.)"""
    import os

    env = os.environ.get("RTLSDR_DEMOD_SUBL")
    if env:
        subl = int(env)
        return subl, subl * LANE
    if C <= 1024:
        subl = 8
    elif C <= 2048:
        subl = 16
    else:
        subl = 32
    return subl, subl * LANE

# --- packed row layouts (params/state stacked into few refs) ---
# f32 params
PF_ALPHA, PF_AMP, PF_MANUAL, PF_NRATIO, PF_FRATIO = 0, 1, 2, 3, 4
PF_LPGAIN, PF_LPY0, PF_LPY1, PF_ND0, PF_ND1, PF_ND2 = 5, 6, 7, 8, 9, 10
PF_FNTONES, PF_SNTONES = 11, 12
PF_ISNFM, PF_RAWIQ, PF_IQOUT, PF_USEMAN, PF_LPEN, PF_NOTCHEN, PF_CTCSSEN = 13, 14, 15, 16, 17, 18, 19
PF_VALID = 20  # 1.0 for real channels, 0.0 for pad lanes (tile-gate masks)
PF_ROWS = 21
# i32 params
PI_DPHI, PI_FWIN, PI_SWIN = 0, 1, 2
PI_ROWS = 3
# f32 state
SF_NF, SF_PREF, SF_PREC, SF_POSTF, SF_POSTC, SF_AGC, SF_PR, SF_PJ, SF_PREVW = range(9)
SF_ROWS = 9
# i32 state
(SI_CUR, SI_NXT, SI_DELAY, SI_LSC, SI_SAMPC, SI_OPENC, SI_FLAPC, SI_ROC,
 SI_CSC, SI_UPF, SI_PHI) = range(11)
SI_FCOUNT, SI_FENOUGH, SI_FTONE, SI_FFOUND, SI_FNFOUND = 11, 12, 13, 14, 15
SI_SCOUNT, SI_SENOUGH, SI_STONE, SI_SFOUND, SI_SNFOUND = 16, 17, 18, 19, 20
SI_ROWS = 21
# biquad state rows
FL_XR, FL_XI, FL_YR, FL_YI, FL_NX, FL_NY = 0, 3, 6, 9, 12, 15  # each 3 rows
FL_ROWS = 18
# ctcss recurrence rows
CQ_FQ1, CQ_FQ2, CQ_SQ1, CQ_SQ2 = 0, 1, 2, 3

_LUT_STEP = np.float32(2.0 * np.pi / 256.0)
_SIN_STEP = np.float32(np.sin(2.0 * np.pi / 256.0))
_COS_STEP = np.float32(np.cos(2.0 * np.pi / 256.0))


def _time_chunks(W: int, target: int = 512) -> int:
    """Largest divisor of W that is <= target; W itself if none."""
    best = W
    for wt in range(min(W, target), 0, -1):
        if W % wt == 0:
            best = wt
            break
    return best


def _fast_atan2(y, x):
    """reference: rtl_airband.cpp:147-166.  Select the branch's operands
    FIRST, then do one divide: per-lane bit-identical to dividing in both
    branches and selecting after, at half the (expensive) VPU divides."""
    yabs = jnp.abs(y)
    pos = x >= 0.0
    num = jnp.where(pos, x - yabs, x + yabs)
    den = jnp.where(pos, x + yabs, yabs - x)
    angle = jnp.where(pos, _PI4, _PI34) - _PI4 * (num / den)
    angle = jnp.where(y < 0.0, -angle, angle)
    return jnp.where((x == 0.0) & (y == 0.0), F32(0.0), angle)


def _make_kernel(W: int, WT: int, fm_quadri: bool, with_ctcss: bool, with_iq: bool, unroll: int = 1, pair: bool = False):
    """``pair=True`` co-schedules TWO channel tiles per grid step: each loop
    trip runs both tiles' step bodies in one trace, so Mosaic may interleave
    the two independent dependency chains (the per-sample recurrence is
    latency-bound — scripts/bench_chain_probe.py measures a second 32-wide
    chain riding the first one's latency shadow at +1% cost).  Semantics are
    identical (disjoint scratch/data slices per tile); only the schedule and
    the grid shape change."""
    T = W // WT
    H = 2 if pair else 1
    SHIFT_SQ = W % SQ_BUF
    SHIFT_DL = W % AGC_EXTRA

    def kernel(
        mags_ref, inr_ref, ini_ref,           # [WT, H, 8, 128] data
        pf_ref, pi_ref, cf_ref, cm_ref,       # params
        sf_in, si_in, fl_in, sqb_in, dl_in, ctq_in,  # state in
        wo_ref, iqr_ref, iqi_ref, flag_ref,   # data out
        sf_out, si_out, fl_out, sqb_out, dl_out, ctq_out,  # state out
        sf_s, si_s, flt_s, sqb_s, dl_s, ctq_s, tmp_s,  # scratch [H, ...]
    ):
        t = pl.program_id(1)

        def make_half(h):
            sf, si, flt = sf_s.at[h], si_s.at[h], flt_s.at[h]
            sqb, dl, ctq, tmp = sqb_s.at[h], dl_s.at[h], ctq_s.at[h], tmp_s.at[h]
            return _half_body(h, sf, si, flt, sqb, dl, ctq, tmp)

        def _half_body(h, sf, si, flt, sqb, dl, ctq, tmp):
            def init():
                sf[:] = sf_in[:, h]
                si[:] = si_in[:, h]
                flt[:] = fl_in[:, h]
                sqb[:] = sqb_in[:, h]
                dl[:] = dl_in[:, h]
                ctq[:] = ctq_in[:, :, h]

            # ---- loop-invariant params (bools as f32 masks -> bool) ----
            p_alpha = pf_ref[PF_ALPHA, h]
            p_amp = pf_ref[PF_AMP, h]
            p_manual = pf_ref[PF_MANUAL, h]
            p_nratio = pf_ref[PF_NRATIO, h]
            p_fratio = pf_ref[PF_FRATIO, h]
            p_lpgain = pf_ref[PF_LPGAIN, h]
            p_lpy0 = pf_ref[PF_LPY0, h]
            p_lpy1 = pf_ref[PF_LPY1, h]
            p_nd0 = pf_ref[PF_ND0, h]
            p_nd1 = pf_ref[PF_ND1, h]
            p_nd2 = pf_ref[PF_ND2, h]
            p_fnt = pf_ref[PF_FNTONES, h]
            p_snt = pf_ref[PF_SNTONES, h]
            is_nfm = pf_ref[PF_ISNFM, h] > 0.5
            is_am = ~is_nfm
            needs_iq = pf_ref[PF_RAWIQ, h] > 0.5
            iq_outs = pf_ref[PF_IQOUT, h] > 0.5
            useman = pf_ref[PF_USEMAN, h] > 0.5
            lp_en = pf_ref[PF_LPEN, h] > 0.5
            notch_en = pf_ref[PF_NOTCHEN, h] > 0.5
            ctcss_en = pf_ref[PF_CTCSSEN, h] > 0.5
            p_dphi = pi_ref[PI_DPHI, h]
            p_fwin = pi_ref[PI_FWIN, h]
            p_swin = pi_ref[PI_SWIN, h]
            # hoisted loop-invariant reciprocal: a VPU divide per step is ~an
            # order of magnitude more issue slots than a multiply
            p_inv_lpgain = F32(1.0) / p_lpgain

            # per-tile cost-class gates (the cost_group_permutation clusters
            # channels so whole tiles share these — the same trick the CTCSS
            # bank already uses): an all-NFM tile skips the AM envelope/AGC
            # block, an all-AM tile skips the discriminator/de-emphasis block,
            # and a notch-free tile skips the notch biquad.  Pad lanes are
            # excluded via PF_VALID so homogeneous populations gate cleanly.
            valid = pf_ref[PF_VALID, h] > 0.5
            tile_am = jnp.any(is_am & valid)
            tile_nfm = jnp.any(is_nfm & valid)
            tile_notch = jnp.any(notch_en)

            def levels(nf, roc):
                """Eager squelch_level() (reference: squelch.cpp:169-177)."""
                flapping = roc >= FLAP_OPENS_THRESHOLD
                ratio = jnp.where(flapping & (p_fratio < p_nratio), p_fratio, p_nratio)
                return jnp.where(useman, p_manual, ratio * nf)

            def step(k, _carry):
                n = t * WT + k
                s = mags_ref[k, h]
                in_r = inr_ref[k, h]
                in_i = ini_ref[k, h]

                cur = si[SI_CUR]
                nxt = si[SI_NXT]
                st_nf = sf[SF_NF]
                st_prec = sf[SF_PREC]
                st_postc = sf[SF_POSTC]
                upf0 = si[SI_UPF] != 0
                pos_sq = n % SQ_BUF
                buf_old = sqb[pos_sq]  # age-102 value (pre-append)

                # ======== Squelch::update_current_state (squelch.cpp:363-460) ========
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

                delay0 = si[SI_DELAY]
                delay1 = jnp.where(A1 | B1 | (C1 & (cur != CLOSING)), 0, jnp.where(A2 | B2 | C2, delay0 + 1, delay0))

                csc0 = si[SI_CSC]
                a2_fire = A2 & (delay1 >= OPEN_DELAY)
                a2_count = a2_fire & (csc0 < RECENT_SAMPLE_SIZE)
                roc1 = si[SI_ROC] + a2_count.astype(I32)
                flappy1 = si[SI_FLAPC] + (a2_count & (roc1 >= FLAP_OPENS_THRESHOLD)).astype(I32)

                def hassig(roc):
                    lvl = levels(st_nf, roc)
                    return (st_prec >= lvl) & (~upf0 | (st_postc >= buf_old))

                hasA = hassig(roc1)
                hasB = hassig(si[SI_ROC])

                b2_fire = B2 & (delay1 >= CLOSE_DELAY)
                c2_fire = C2 & (delay1 >= CLOSE_DELAY)

                cur1 = cur
                cur1 = jnp.where(A1, OPENING, cur1)
                cur1 = jnp.where(B1, CLOSING, cur1)
                cur1 = jnp.where(b2_fire & hasB, OPEN, cur1)
                cur1 = jnp.where(C1, LSA, cur1)
                cur1 = jnp.where(is_D, OPEN, cur1)
                cur1 = jnp.where(is_E, CLOSED, cur1)
                cur1 = jnp.where(is_else, nxt, cur1)

                nxt1 = nxt
                nxt1 = jnp.where(a2_fire, jnp.where(hasA, OPEN, CLOSED), nxt1)
                nxt1 = jnp.where(b2_fire, jnp.where(hasB, OPEN, CLOSED), nxt1)
                nxt1 = jnp.where(c2_fire, CLOSED, nxt1)

                lsc1 = jnp.where(A1, 0, si[SI_LSC])
                upf1 = upf0 & ~(A1 | is_E)
                open_count1 = si[SI_OPENC] + is_D.astype(I32)
                roc1 = jnp.where(is_F & (csc0 == RECENT_SAMPLE_SIZE), 0, roc1)
                csc1 = jnp.where(is_E, 0, csc0)
                csc1 = jnp.where(is_F & (csc0 < RECENT_SAMPLE_SIZE), csc0 + 1, csc1)
                ctcss_reset = is_E & ctcss_en  # see demod.py: disabled channels' bank state is zero either way

                # ======== process_raw_sample rest (squelch.cpp:196-246) ========
                sample_count1 = si[SI_SAMPC] + 1
                do_nf = (sample_count1 & 15) == 0  # % 16 (counts are non-negative)
                nf1 = jnp.where(do_nf, st_nf * NF_DECAY + jnp.minimum(st_prec, st_nf) * NF_NEW + NF_BIAS, st_nf)
                cap = F32(1.5) * jnp.where(useman, p_manual, p_nratio * nf1)

                pre_full1 = sf[SF_PREF] * MA_DECAY + s * MA_NEW
                pre_capped1 = jnp.where(
                    (st_prec >= cap) & (s >= cap), cap, jnp.minimum(cap, st_prec * MA_DECAY + s * MA_NEW)
                )
                sqb[pos_sq] = pre_capped1 * PRE_VS_POST  # append (overwrites oldest)
                buf_tail = sqb[(n + 1) % SQ_BUF]  # age-101 value (post-append oldest)

                lvl1 = levels(nf1, roc1)
                has_pre = pre_capped1 >= lvl1
                has_sig = has_pre & (~upf1 | (st_postc >= buf_tail))

                # set_state(...) with the validity table collapsed under each
                # call-site's mask (exhaustively equal to _set_state_valid —
                # see tests/test_demod_pallas.py::test_transition_specializations):
                # cur==OPEN -> CLOSING stays CLOSING; cur==CLOSED -> OPENING stays
                nxt2 = jnp.where((cur1 == OPEN) & ~has_sig, CLOSING, nxt1)
                nxt2 = jnp.where((cur1 == CLOSED) & has_sig, OPENING, nxt2)

                active = (cur1 != CLOSED) & (cur1 != LSA)
                below = s < lvl1
                lsc2 = jnp.where(active, jnp.where(below, lsc1 + 1, 0), lsc1)
                lsa_fire = active & below & (lsc2 >= LOW_SIGNAL_ABORT)
                # under active (cur in {OPENING,CLOSING,OPEN}): LSA except OPENING->CLOSED
                nxt3 = jnp.where(lsa_fire, jnp.where(cur1 == OPENING, CLOSED, LSA), nxt2)

                # ======== filtering path (rtl_airband.cpp:507-529) ========
                should_filter = (has_pre | (cur1 != CLOSED)) & (cur1 != LSA)
                do_filter = should_filter & needs_iq

                # derotation: interpolated 256-entry LUT (util.cpp:113-127); the
                # table values sin(2*pi*i/256) are evaluated in-kernel
                phi = si[SI_PHI]
                idx = jax.lax.shift_right_logical(phi, 16)
                fract = (phi & 0xFFFF).astype(F32) * F32(1.0 / 65536.0)
                ang1 = idx.astype(F32) * _LUT_STEP
                s1 = jnp.sin(ang1)
                c1 = jnp.cos(ang1)
                # neighbouring table entry by exact angle addition (saves two
                # transcendentals; differs from sin((idx+1)*step) by ~1e-7)
                s2 = s1 * _COS_STEP + c1 * _SIN_STEP
                c2 = c1 * _COS_STEP - s1 * _SIN_STEP
                swf = s1 + (s2 - s1) * fract
                cwf = c1 + (c2 - c1) * fract
                re_d = in_r * cwf + in_i * swf
                im_d = in_i * cwf - in_r * swf
                phi1 = jnp.where(do_filter, (phi + p_dphi) & 0xFFFFFF, phi)

                # complex Bessel lowpass biquad (filters.cpp:158-180)
                adv_lp = do_filter & lp_en
                x2r = re_d * p_inv_lpgain
                x2i = im_d * p_inv_lpgain
                xr0 = jnp.where(adv_lp, flt[FL_XR + 1], flt[FL_XR + 0])
                xr1 = jnp.where(adv_lp, flt[FL_XR + 2], flt[FL_XR + 1])
                xr2 = jnp.where(adv_lp, x2r, flt[FL_XR + 2])
                xi0 = jnp.where(adv_lp, flt[FL_XI + 1], flt[FL_XI + 0])
                xi1 = jnp.where(adv_lp, flt[FL_XI + 2], flt[FL_XI + 1])
                xi2 = jnp.where(adv_lp, x2i, flt[FL_XI + 2])
                yr1p, yr2p = flt[FL_YR + 1], flt[FL_YR + 2]
                yi1p, yi2p = flt[FL_YI + 1], flt[FL_YI + 2]
                y2r = (xr0 + xr2) + F32(2.0) * xr1 + p_lpy0 * yr1p + p_lpy1 * yr2p
                y2i = (xi0 + xi2) + F32(2.0) * xi1 + p_lpy0 * yi1p + p_lpy1 * yi2p
                flt[FL_XR + 0] = xr0
                flt[FL_XR + 1] = xr1
                flt[FL_XR + 2] = xr2
                flt[FL_XI + 0] = xi0
                flt[FL_XI + 1] = xi1
                flt[FL_XI + 2] = xi2
                flt[FL_YR + 0] = jnp.where(adv_lp, yr1p, flt[FL_YR + 0])
                flt[FL_YR + 1] = jnp.where(adv_lp, yr2p, yr1p)
                flt[FL_YR + 2] = jnp.where(adv_lp, y2r, yr2p)
                flt[FL_YI + 0] = jnp.where(adv_lp, yi1p, flt[FL_YI + 0])
                flt[FL_YI + 1] = jnp.where(adv_lp, yi2p, yi1p)
                flt[FL_YI + 2] = jnp.where(adv_lp, y2i, yi2p)

                filt_r = jnp.where(lp_en, y2r, re_d)
                filt_i = jnp.where(lp_en, y2i, im_d)
                real = jnp.where(do_filter, filt_r, in_r)
                imag = jnp.where(do_filter, filt_i, in_i)
                wavein_mod = jnp.where(do_filter, jnp.sqrt(real * real + imag * imag), s)

                # process_filtered_sample (squelch.cpp:248-276)
                pf = do_filter & lp_en
                opening = cur1 == OPENING
                skip = pf & opening & (delay1 < SQ_BUF)
                init_pf = pf & opening & (delay1 == SQ_BUF)
                post_full_b = jnp.where(init_pf, buf_tail, sf[SF_POSTF])
                post_capped_b = jnp.where(init_pf, buf_tail, st_postc)
                eff = pf & ~skip
                upf2 = upf1 | eff
                post_full1 = jnp.where(eff, post_full_b * MA_DECAY + wavein_mod * MA_NEW, post_full_b)
                post_capped1 = jnp.where(
                    eff,
                    jnp.where((post_capped_b >= cap) & (wavein_mod >= cap), cap,
                              jnp.minimum(cap, post_capped_b * MA_DECAY + wavein_mod * MA_NEW)),
                    post_capped_b,
                )
                close_fire = eff & (post_capped1 < buf_tail)
                # set_state(CLOSED) collapsed: OPEN->CLOSING, else CLOSED
                nxt4 = jnp.where(close_fire, jnp.where(cur1 == OPEN, CLOSING, CLOSED), nxt3)

                # ======== demod (rtl_airband.cpp:532-618) ========
                first_open = (cur1 != OPEN) & (nxt4 == OPEN)
                last_open = ((cur1 == CLOSING) & (nxt4 == CLOSED)) | ((cur1 != LSA) & (nxt4 == LSA))
                spa = (cur1 == OPEN) | (cur1 == CLOSING)

                pos_dl = n % AGC_EXTRA
                env = dl[pos_dl]  # wavein[j - AGC_EXTRA] (oldest, pre-append)
                st_agc = sf[SF_AGC]

                # ---- AM path (skipped for all-NFM tiles) ----
                tmp[1] = jnp.zeros_like(st_agc)  # waveout accumulator
                tmp[2] = st_agc                  # post-demod agc accumulator

                @pl.when(tile_am)
                def _am_path():
                    # AM squelch-open AGC bootstrap (rtl_airband.cpp:534-540):
                    # the reference's sequential fold over the 100-sample
                    # look-back, executed only on samples where some channel in
                    # the tile opens
                    trigger = first_open & is_am
                    tmp[0] = st_agc
                    @pl.when(jnp.any(trigger))
                    def _bootstrap():
                        def bloop(i, a):
                            v = dl[(n + i) % AGC_EXTRA]  # i=0 oldest .. i=99 newest
                            return jnp.where(v >= lvl1, F32(0.9) * a + F32(0.1) * v, a)
                        boot = jax.lax.fori_loop(0, AGC_EXTRA, bloop, st_agc)
                        tmp[0] = jnp.where(trigger, boot, st_agc)
                    agc1 = tmp[0]

                    # AM envelope demod + AGC (rtl_airband.cpp:548-562)
                    am_agc_up = spa & is_am & (wavein_mod > lvl1)
                    agc_am = jnp.where(am_agc_up, agc1 * F32(0.995) + wavein_mod * F32(0.005), agc1)
                    w_am = (env - agc_am) / (agc_am * F32(1.5))
                    over = jnp.abs(w_am) > F32(0.8)
                    w_am = jnp.where(over, w_am * F32(0.85), w_am)
                    agc_am = jnp.where(spa & is_am & over, agc_am * F32(1.15), agc_am)
                    tmp[1] = w_am
                    # off-spa AM lanes keep agc1 (the bootstrap value must
                    # survive the OPENING sample where spa is still false)
                    tmp[2] = jnp.where(is_am, jnp.where(spa, agc_am, agc1), st_agc)

                # ---- NFM path (skipped for all-AM tiles) ----
                @pl.when(tile_nfm)
                def _nfm_path():
                    # discriminator + DC block + de-emphasis
                    # (rtl_airband.cpp:564-582); NFM channels never run the
                    # bootstrap, so their pre-demod agc is st_agc as-is
                    pr0, pj0 = sf[SF_PR], sf[SF_PJ]
                    if fm_quadri:
                        disc = (pr0 * imag - real * pj0) / (real * real + imag * imag + F32(1.0)) * _M1PI
                    else:
                        cr = real * pr0 + imag * pj0
                        cj = imag * pr0 - real * pj0
                        disc = _fast_atan2(cj, cr) * _M1PI
                    agc_nfm = st_agc * F32(0.995) + disc * F32(0.005)
                    w_n = disc - agc_nfm
                    w_n = w_n * (F32(1.0) - p_alpha) + sf[SF_PREVW] * p_alpha

                    nfm_adv = spa & is_nfm
                    sf[SF_PR] = jnp.where(nfm_adv, real, pr0)
                    sf[SF_PJ] = jnp.where(nfm_adv, imag, pj0)
                    sf[SF_PREVW] = jnp.where(nfm_adv, w_n, sf[SF_PREVW])
                    tmp[1] = jnp.where(is_am, tmp[1], w_n)
                    tmp[2] = jnp.where(is_am, tmp[2], jnp.where(spa, agc_nfm, st_agc))

                waveout = tmp[1]
                agc2 = tmp[2]

                dl[pos_dl] = wavein_mod  # append after env/bootstrap reads

                # ======== CTCSS (squelch.cpp:278-292, ctcss.cpp) ========
                if with_ctcss:
                    adv_ct = spa & (cur1 != CLOSED) & ctcss_en

                    # The whole Goertzel bank (the most expensive per-step work:
                    # 52 tones x 2 banks) runs only on samples where some channel
                    # in the tile is advancing it or resetting it — matching the
                    # reference, which only runs CTCSS while the squelch is
                    # open/closing (squelch.cpp:278-292).  When skipped, no bank
                    # state would change, so the stored values stay valid.
                    @pl.when(jnp.any(adv_ct | ctcss_reset))
                    def _ctcss_banks():
                        def bank_step(q1_row, q2_row, coeff, mask, window, ntones, advance,
                                      count_row, enough_row, tone_row, found_row, nfound_row):
                            q1 = ctq[q1_row]
                            q2 = ctq[q2_row]
                            q1 = jnp.where(ctcss_reset[None], F32(0.0), q1)
                            q2 = jnp.where(ctcss_reset[None], F32(0.0), q2)
                            count = jnp.where(ctcss_reset, 0, si[count_row])
                            enough = (si[enough_row] != 0) & ~ctcss_reset
                            has_tone = (si[tone_row] != 0) & ~ctcss_reset

                            q0 = coeff * q1 - q2 + waveout[None]
                            adv3 = advance[None]
                            q2n = jnp.where(adv3, q1, q2)
                            q1n = jnp.where(adv3, q0, q1)
                            countn = jnp.where(advance, count + 1, count)
                            latch = advance & (countn >= window)

                            ctq[q1_row] = q1n
                            ctq[q2_row] = q2n
                            si[count_row] = countn
                            si[enough_row] = enough.astype(I32)
                            si[tone_row] = has_tone.astype(I32)

                            @pl.when(jnp.any(latch))
                            def _decide():
                                q1v = ctq[q1_row]
                                q2v = ctq[q2_row]
                                power = q1v * q1v + q2v * q2v - q1v * q2v * coeff
                                powm = jnp.where(mask, power, -jnp.inf)
                                maxp = jnp.max(powm, axis=0)
                                avg = jnp.sum(jnp.where(mask, power, F32(0.0)), axis=0) / ntones
                                detected = (power[0] == maxp) & (power[0] > avg)
                                si[tone_row] = ((latch & detected) | (~latch & has_tone)).astype(I32)
                                si[enough_row] = (enough | latch).astype(I32)
                                si[found_row] = si[found_row] + jnp.where(latch & detected, 1, 0)
                                si[nfound_row] = si[nfound_row] + jnp.where(latch & ~detected, 1, 0)
                                latch3 = latch[None]
                                ctq[q1_row] = jnp.where(latch3, F32(0.0), q1v)
                                ctq[q2_row] = jnp.where(latch3, F32(0.0), q2v)
                                si[count_row] = jnp.where(latch, 0, countn)

                        bank_step(CQ_SQ1, CQ_SQ2, cf_ref[1, :, h], cm_ref[1, :, h] > 0.5, p_swin, p_snt,
                                  adv_ct, SI_SCOUNT, SI_SENOUGH, SI_STONE, SI_SFOUND, SI_SNFOUND)
                        adv_fast = adv_ct & ~(si[SI_SENOUGH] != 0)
                        bank_step(CQ_FQ1, CQ_FQ2, cf_ref[0, :, h], cm_ref[0, :, h] > 0.5, p_fwin, p_fnt,
                                  adv_fast, SI_FCOUNT, SI_FENOUGH, SI_FTONE, SI_FFOUND, SI_FNFOUND)

                    slow_enough = si[SI_SENOUGH] != 0
                    slow_tone = si[SI_STONE] != 0
                    fast_tone = si[SI_FTONE] != 0
                    tone_ok = (slow_enough & slow_tone) | (~slow_enough & fast_tone)
                    gate = tone_ok | ~ctcss_en
                else:
                    gate = spa | ~spa

                open_now = spa & gate

                # ======== notch + ampfactor + clamp (rtl_airband.cpp:590-618) ========
                # tmp[1] still holds waveout — the default w3 for notch-free tiles
                @pl.when(tile_notch)
                def _notch():
                    adv_notch = open_now & notch_en
                    nx0 = jnp.where(adv_notch, flt[FL_NX + 1], flt[FL_NX + 0])
                    nx1 = jnp.where(adv_notch, flt[FL_NX + 2], flt[FL_NX + 1])
                    nx2 = jnp.where(adv_notch, waveout, flt[FL_NX + 2])
                    ny1p, ny2p = flt[FL_NY + 1], flt[FL_NY + 2]
                    ny2 = p_nd0 * nx2 - p_nd1 * nx1 + p_nd0 * nx0 + p_nd1 * ny2p - p_nd2 * ny1p
                    flt[FL_NX + 0] = nx0
                    flt[FL_NX + 1] = nx1
                    flt[FL_NX + 2] = nx2
                    flt[FL_NY + 0] = jnp.where(adv_notch, ny1p, flt[FL_NY + 0])
                    flt[FL_NY + 1] = jnp.where(adv_notch, ny2p, ny1p)
                    flt[FL_NY + 2] = jnp.where(adv_notch, ny2, ny2p)
                    tmp[1] = jnp.where(notch_en, ny2, waveout)

                w3 = tmp[1]
                w4 = w3 * p_amp
                w5 = jnp.where(w4 != w4, F32(0.0), jnp.clip(w4, -1.0, 1.0))
                waveout_final = jnp.where(open_now, w5, F32(0.0))

                # ---- outputs ----
                wo_ref[k, h] = waveout_final
                if with_iq:  # skipped entirely when no channel has IQ outputs
                    iqr_ref[k, h] = jnp.where(open_now & iq_outs, real, F32(0.0))
                    iqi_ref[k, h] = jnp.where(open_now & iq_outs, imag, F32(0.0))
                fade = last_open & is_am
                flag_ref[k, h] = open_now.astype(I32) + 2 * fade.astype(I32)

                # ---- state writeback ----
                sf[SF_NF] = nf1
                sf[SF_PREF] = pre_full1
                sf[SF_PREC] = pre_capped1
                sf[SF_POSTF] = post_full1
                sf[SF_POSTC] = post_capped1
                sf[SF_AGC] = agc2
                si[SI_CUR] = cur1
                si[SI_NXT] = nxt4
                si[SI_DELAY] = delay1
                si[SI_LSC] = lsc2
                si[SI_SAMPC] = sample_count1
                si[SI_OPENC] = open_count1
                si[SI_FLAPC] = flappy1
                si[SI_ROC] = roc1
                si[SI_CSC] = csc1
                si[SI_UPF] = upf2.astype(I32)
                si[SI_PHI] = phi1
                return _carry
            def finish():
                sf_out[:, h] = sf[:]
                si_out[:, h] = si[:]
                fl_out[:, h] = flt[:]
                ctq_out[:, :, h] = ctq[:]

                # un-rotate rings into canonical row-0-oldest order
                def unrot_sq(kk, c):
                    sqb_out[kk, h] = sqb[(kk + SHIFT_SQ) % SQ_BUF]
                    return c
                jax.lax.fori_loop(0, SQ_BUF, unrot_sq, 0)

                def unrot_dl(kk, c):
                    dl_out[kk, h] = dl[(kk + SHIFT_DL) % AGC_EXTRA]
                    return c
                jax.lax.fori_loop(0, AGC_EXTRA, unrot_dl, 0)

            return init, step, finish

        halves = [make_half(h) for h in range(H)]

        @pl.when(t == 0)
        def _init():
            for ini, _s, _f in halves:
                ini()

        # unroll > 1 processes several samples per loop trip (manual unroll —
        # Mosaic's fori_loop only supports full-or-no unrolling), amortizing
        # loop overhead; the sample-to-sample dependency chain itself is
        # unchanged (latency-floor experiment, BENCH_SCALING.md round 3).
        # In pair mode both halves' bodies share each loop trip (one trace:
        # Mosaic may interleave the two independent chains).
        if unroll > 1 and WT % unroll == 0:
            def step_u(k, c):
                for u in range(unroll):
                    for _i, s, _f in halves:
                        c = s(k * unroll + u, c)
                return c

            jax.lax.fori_loop(0, WT // unroll, step_u, 0)
        else:
            def step_all(k, c):
                for _i, s, _f in halves:
                    c = s(k, c)
                return c

            jax.lax.fori_loop(0, WT, step_all, 0)

        @pl.when(t == T - 1)
        def _finish():
            for _i, _s, fin in halves:
                fin()
    return kernel


def _pad_c(a, fill, C, Cp):
    """Pad the trailing channel axis C -> Cp with ``fill``."""
    if Cp == C:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, Cp - C)]
    return jnp.pad(a, pad, constant_values=fill)


def _tile(a, G, subl):
    """[..., Cp] -> [..., G, subl, LANE]."""
    return a.reshape(a.shape[:-1] + (G, subl, LANE))


@partial(jax.jit, static_argnames=("fm_quadri", "with_ctcss", "with_iq", "interpret", "unroll", "pair"))
def demod_block_pallas(
    params: ChannelParams,
    state: DemodState,
    mags: jax.Array,  # [W, C]
    iqs: jax.Array,  # [W, C, 2]
    *,
    fm_quadri: bool = False,
    with_ctcss: bool = True,
    with_iq: bool = True,
    interpret: bool = False,
    unroll: int = 1,
    pair: bool | None = None,
):
    """Drop-in replacement for :func:`demod.demod_block` (non-trace mode).

    Returns (new_state, audio [W, C], iq_out [W, C, 2], open_flags [W, C]).
    with_iq=False skips the per-sample IQ-tap stores (use when no channel
    has rawfile/IQ outputs); iq_out is then returned as zeros.

    ``pair`` co-schedules two channel tiles per grid step (see _make_kernel;
    only possible when the tile count is even — i.e. C > 4096 at the default
    widths).  Default: RTLSDR_DEMOD_PAIR env var, else off.
    """
    import os

    W, C = mags.shape
    A = AGC_EXTRA
    SUBL, TILE = _tile_shape(C)
    G = -(-C // TILE)
    Cp = G * TILE
    if pair is None:
        pair = os.environ.get("RTLSDR_DEMOD_PAIR", "0") == "1"
    pair = bool(pair) and G % 2 == 0
    H = 2 if pair else 1
    # keep data blocks a constant byte size as tiles widen (VMEM budget)
    WT = _time_chunks(W, target=512 * 8 // SUBL)
    T = W // WT

    f32 = lambda a: a.astype(F32)
    msk = lambda a: a.astype(F32)  # bool -> f32 mask

    # ---- pack params ----
    p = params
    pf = jnp.stack([
        _pad_c(f32(p.alpha), 0.0, C, Cp),
        _pad_c(f32(p.ampfactor), 0.0, C, Cp),
        _pad_c(f32(p.manual_level), 1e30, C, Cp),
        _pad_c(f32(p.normal_ratio), 1.0, C, Cp),
        _pad_c(f32(p.flappy_ratio), 0.9, C, Cp),
        _pad_c(f32(p.lp_gain), 1.0, C, Cp),
        _pad_c(f32(p.lp_y0), 0.0, C, Cp),
        _pad_c(f32(p.lp_y1), 0.0, C, Cp),
        _pad_c(f32(p.notch_d0), 0.0, C, Cp),
        _pad_c(f32(p.notch_d1), 0.0, C, Cp),
        _pad_c(f32(p.notch_d2), 0.0, C, Cp),
        _pad_c(f32(p.fast_ntones), 1.0, C, Cp),
        _pad_c(f32(p.slow_ntones), 1.0, C, Cp),
        _pad_c(msk(p.is_nfm), 0.0, C, Cp),
        _pad_c(msk(p.needs_raw_iq), 0.0, C, Cp),
        _pad_c(msk(p.has_iq_outputs), 0.0, C, Cp),
        _pad_c(msk(p.using_manual), 1.0, C, Cp),
        _pad_c(msk(p.lp_enabled), 0.0, C, Cp),
        _pad_c(msk(p.notch_enabled), 0.0, C, Cp),
        _pad_c(msk(p.ctcss_enabled), 0.0, C, Cp),
        _pad_c(jnp.ones((C,), F32), 0.0, C, Cp),  # PF_VALID
    ])
    pf = _tile(pf, G, SUBL)
    pi = jnp.stack([
        _pad_c(p.dm_dphi.astype(I32), 0, C, Cp),  # < 2^24: exact in int32
        _pad_c(p.fast_window.astype(I32), 1 << 30, C, Cp),
        _pad_c(p.slow_window.astype(I32), 1 << 30, C, Cp),
    ])
    pi = _tile(pi, G, SUBL)
    cf = _tile(jnp.stack([_pad_c(f32(p.fast_coeff), 0.0, C, Cp), _pad_c(f32(p.slow_coeff), 0.0, C, Cp)]), G, SUBL)
    cm = _tile(jnp.stack([_pad_c(msk(p.fast_mask), 0.0, C, Cp), _pad_c(msk(p.slow_mask), 0.0, C, Cp)]), G, SUBL)

    # ---- pack state ----
    st = state
    sf_in = _tile(jnp.stack([
        _pad_c(f32(st.noise_floor), 0.0, C, Cp),
        _pad_c(f32(st.pre_full), 0.0, C, Cp),
        _pad_c(f32(st.pre_capped), 0.0, C, Cp),
        _pad_c(f32(st.post_full), 0.0, C, Cp),
        _pad_c(f32(st.post_capped), 0.0, C, Cp),
        _pad_c(f32(st.agc), 0.0, C, Cp),
        _pad_c(f32(st.pr), 0.0, C, Cp),
        _pad_c(f32(st.pj), 0.0, C, Cp),
        _pad_c(f32(st.prev_waveout), 0.0, C, Cp),
    ]), G, SUBL)
    si_in = _tile(jnp.stack([
        _pad_c(st.cur.astype(I32), CLOSED, C, Cp),
        _pad_c(st.nxt.astype(I32), CLOSED, C, Cp),
        _pad_c(st.delay.astype(I32), 0, C, Cp),
        _pad_c(st.low_signal_count.astype(I32), 0, C, Cp),
        _pad_c(st.sample_count.astype(I32), 0, C, Cp),
        _pad_c(st.open_count.astype(I32), 0, C, Cp),
        _pad_c(st.flappy_count.astype(I32), 0, C, Cp),
        _pad_c(st.recent_open_count.astype(I32), 0, C, Cp),
        _pad_c(st.closed_sample_count.astype(I32), 0, C, Cp),
        _pad_c(st.using_post_filter.astype(I32), 0, C, Cp),
        _pad_c(st.dm_phi.astype(I32), 0, C, Cp),
        _pad_c(st.fast.count.astype(I32), 0, C, Cp),
        _pad_c(st.fast.enough.astype(I32), 0, C, Cp),
        _pad_c(st.fast.has_tone.astype(I32), 0, C, Cp),
        _pad_c(st.fast.found.astype(I32), 0, C, Cp),
        _pad_c(st.fast.not_found.astype(I32), 0, C, Cp),
        _pad_c(st.slow.count.astype(I32), 0, C, Cp),
        _pad_c(st.slow.enough.astype(I32), 0, C, Cp),
        _pad_c(st.slow.has_tone.astype(I32), 0, C, Cp),
        _pad_c(st.slow.found.astype(I32), 0, C, Cp),
        _pad_c(st.slow.not_found.astype(I32), 0, C, Cp),
    ]), G, SUBL)
    fl_in = _tile(jnp.concatenate([
        _pad_c(f32(st.lp_xr), 0.0, C, Cp),
        _pad_c(f32(st.lp_xi), 0.0, C, Cp),
        _pad_c(f32(st.lp_yr), 0.0, C, Cp),
        _pad_c(f32(st.lp_yi), 0.0, C, Cp),
        _pad_c(f32(st.notch_x), 0.0, C, Cp),
        _pad_c(f32(st.notch_y), 0.0, C, Cp),
    ], axis=0), G, SUBL)
    sqb_in = _tile(_pad_c(f32(st.sq_buffer), 0.0, C, Cp), G, SUBL)
    dl_in = _tile(_pad_c(f32(st.wavein_delay), 0.0, C, Cp), G, SUBL)
    ctq_in = _tile(jnp.stack([
        _pad_c(f32(st.fast.q1), 0.0, C, Cp),
        _pad_c(f32(st.fast.q2), 0.0, C, Cp),
        _pad_c(f32(st.slow.q1), 0.0, C, Cp),
        _pad_c(f32(st.slow.q2), 0.0, C, Cp),
    ]), G, SUBL)

    # ---- data: iq stream with AGC_EXTRA lag (rtl_airband.cpp:497-498) ----
    iq_stream = jnp.concatenate([st.iq_tail, iqs[: W - A]], axis=0)  # [W, C, 2]
    mags_t = _tile(_pad_c(mags, 0.0, C, Cp), G, SUBL)
    inr_t = _tile(_pad_c(iq_stream[..., 0], 0.0, C, Cp), G, SUBL)
    ini_t = _tile(_pad_c(iq_stream[..., 1], 0.0, C, Cp), G, SUBL)

    kernel = _make_kernel(W, WT, fm_quadri, with_ctcss, with_iq, unroll=unroll, pair=pair)

    def dspec(lead):  # time-chunked data [W, G, 8, 128]; H tiles per step
        return pl.BlockSpec((lead, H, SUBL, LANE), lambda g, t: (t, g, 0, 0), memory_space=pltpu.VMEM)

    def cspec(lead):  # per-channel-tile, time-invariant [lead, G, 8, 128]
        return pl.BlockSpec((lead, H, SUBL, LANE), lambda g, t: (0, g, 0, 0), memory_space=pltpu.VMEM)

    def qspec(lead):  # [lead, MAX_TONES, G, 8, 128]
        return pl.BlockSpec((lead, MAX_TONES, H, SUBL, LANE), lambda g, t: (0, 0, g, 0, 0), memory_space=pltpu.VMEM)

    shp = lambda lead, dt=F32: jax.ShapeDtypeStruct((lead, G, SUBL, LANE), dt)
    out_shape = (
        shp(W), shp(W), shp(W), shp(W, I32),  # waveout, iq_r, iq_i, flags
        shp(SF_ROWS), shp(SI_ROWS, I32), shp(FL_ROWS), shp(SQ_BUF), shp(AGC_EXTRA),
        jax.ShapeDtypeStruct((4, MAX_TONES, G, SUBL, LANE), F32),
    )
    out_specs = (
        dspec(WT), dspec(WT), dspec(WT), dspec(WT),
        cspec(SF_ROWS), cspec(SI_ROWS), cspec(FL_ROWS), cspec(SQ_BUF), cspec(AGC_EXTRA),
        qspec(4),
    )
    in_specs = [
        dspec(WT), dspec(WT), dspec(WT),
        cspec(PF_ROWS), cspec(PI_ROWS), qspec(2), qspec(2),
        cspec(SF_ROWS), cspec(SI_ROWS), cspec(FL_ROWS), cspec(SQ_BUF), cspec(AGC_EXTRA), qspec(4),
    ]
    scratch = [
        pltpu.VMEM((H, SF_ROWS, SUBL, LANE), F32),
        pltpu.VMEM((H, SI_ROWS, SUBL, LANE), I32),
        pltpu.VMEM((H, FL_ROWS, SUBL, LANE), F32),
        pltpu.VMEM((H, SQ_BUF, SUBL, LANE), F32),
        pltpu.VMEM((H, AGC_EXTRA, SUBL, LANE), F32),
        pltpu.VMEM((H, 4, MAX_TONES, SUBL, LANE), F32),
        pltpu.VMEM((H, 3, SUBL, LANE), F32),
    ]

    outs = pl.pallas_call(
        kernel,
        grid=(G // H, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mags_t, inr_t, ini_t, pf, pi, cf, cm, sf_in, si_in, fl_in, sqb_in, dl_in, ctq_in)

    wo, iqr, iqi, flags, sf_o, si_o, fl_o, sqb_o, dl_o, ctq_o = outs
    unt = lambda a: a.reshape(a.shape[:-3] + (Cp,))[..., :C]

    waveout = unt(wo)
    flags = unt(flags)
    open_now = (flags & 1) != 0
    fade = (flags & 2) != 0

    audio, new_tail = apply_fade_and_tail(st.waveout_tail, waveout, fade)
    if with_iq:
        iq_out = jnp.stack([unt(iqr), unt(iqi)], axis=-1)
    else:
        iq_out = jnp.zeros((W, C, 2), F32)

    sfo = unt(sf_o)
    sio = unt(si_o)
    flo = unt(fl_o)
    b = lambda r: sio[r] != 0

    def ct(base, q1_row, q2_row):
        return CtcssState(
            q1=unt(ctq_o)[q1_row], q2=unt(ctq_o)[q2_row],
            count=sio[base], enough=b(base + 1), has_tone=b(base + 2),
            found=sio[base + 3], not_found=sio[base + 4],
        )

    new_state = DemodState(
        noise_floor=sfo[SF_NF], pre_full=sfo[SF_PREF], pre_capped=sfo[SF_PREC],
        post_full=sfo[SF_POSTF], post_capped=sfo[SF_POSTC],
        using_post_filter=b(SI_UPF),
        cur=sio[SI_CUR], nxt=sio[SI_NXT], delay=sio[SI_DELAY],
        low_signal_count=sio[SI_LSC], sample_count=sio[SI_SAMPC],
        open_count=sio[SI_OPENC], flappy_count=sio[SI_FLAPC],
        recent_open_count=sio[SI_ROC], closed_sample_count=sio[SI_CSC],
        sq_buffer=unt(sqb_o),
        lp_xr=flo[FL_XR : FL_XR + 3], lp_xi=flo[FL_XI : FL_XI + 3],
        lp_yr=flo[FL_YR : FL_YR + 3], lp_yi=flo[FL_YI : FL_YI + 3],
        notch_x=flo[FL_NX : FL_NX + 3], notch_y=flo[FL_NY : FL_NY + 3],
        agc=sfo[SF_AGC],
        dm_phi=sio[SI_PHI].astype(jnp.uint32),
        pr=sfo[SF_PR], pj=sfo[SF_PJ], prev_waveout=sfo[SF_PREVW],
        fast=ct(SI_FCOUNT, CQ_FQ1, CQ_FQ2),
        slow=ct(SI_SCOUNT, CQ_SQ1, CQ_SQ2),
        wavein_delay=unt(dl_o),
        iq_tail=iqs[W - A :],
        waveout_tail=new_tail,
    )
    return new_state, audio, iq_out, open_now
