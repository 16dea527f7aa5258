#!/usr/bin/env python
"""End-to-end audio-quality metric: SNR of the TPU pipeline's demodulated
audio against the scalar NumPy refmodel (the sample-exact transcription of
the reference's demod loop, itself verified against the reference's own C++
squelch/CTCSS/filters by tests/test_golden_cpp.py).

Runs a synthetic multi-channel AM+NFM scene through BOTH full chains
(channelizer -> demod) and prints per-channel and worst-case SNR in dB —
the BASELINE.json "audio matches the reference within its SNR bound" metric.

    python scripts/e2e_snr.py [--seconds 1.0] [--backend xla|pallas|auto]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from rtlsdr_airband_tpu.constants import AGC_EXTRA
    from rtlsdr_airband_tpu.ops.demod import demod_block
    from rtlsdr_airband_tpu.ops.demod_pallas import demod_block_pallas
    from rtlsdr_airband_tpu.ops.params import ChannelSpec, init_demod_state, make_channel_params
    from rtlsdr_airband_tpu.refmodel.channel_ref import ChannelRef, ChannelRefConfig, ChannelizerRef, DeviceRef, bin_for_freq
    from rtlsdr_airband_tpu.runtime.pipeline import default_demod_backend
    from rtlsdr_airband_tpu.utils.siggen import SignalGen, am_carrier_iq, complex_noise, nfm_carrier_iq

    FS, N, CENTER = 2_560_000, 512, 120_000_000
    wr = 16000
    specs_kw = [
        dict(frequency=120_300_000, modulation="am"),
        dict(frequency=120_500_000, modulation="am", bandwidth=6000, notch=1000.0),
        dict(frequency=120_700_000, modulation="nfm", bandwidth=8000),
        dict(frequency=120_900_000, modulation="nfm", ctcss=100.0),
    ]
    specs = [ChannelSpec(**kw) for kw in specs_kw]
    C = len(specs)
    n = int(FS * args.seconds)
    iq = complex_noise(n, 0.02, seed=0)
    for i, s in enumerate(specs):
        gen = SignalGen(wr, seed=i).add_tone(600.0 + 170 * i, 0.5).add_noise(0.02)
        if s.ctcss > 0:
            gen.add_tone(s.ctcss, 0.25)
        audio = gen.render(int(wr * args.seconds))
        mk = am_carrier_iq if s.modulation == "am" else nfm_carrier_iq
        kw = dict(audio=audio, carrier_ampl=0.35, audio_rate=wr)
        if s.modulation == "am":
            kw["mod_index"] = 0.8
        else:
            kw["deviation_hz"] = 2500.0
        c = mk(FS, s.frequency - CENTER, n, **kw)
        gate = np.zeros(n, np.float32)
        gate[int(n * 0.1) :] = 1.0
        iq = iq + c * gate

    bins = np.array([bin_for_freq(s.frequency, CENTER, FS, N) for s in specs], np.int32)
    chanzr = ChannelizerRef(N, FS, wr, bins)
    mags, iqs = chanzr.push(iq.astype(np.complex64))
    G = mags.shape[1]
    W, A = wr // 8, AGC_EXTRA
    n_blocks = (G - A) // W
    if n_blocks < 1:
        print("scene too short", file=sys.stderr)
        return 1

    # refmodel chain
    refchs = [ChannelRef(ChannelRefConfig(**{k: v for k, v in kw.items() if k in ChannelRefConfig.__dataclass_fields__}), wr, N, FS, CENTER) for kw in specs_kw]
    ref_audio = np.concatenate([b[0] for b in DeviceRef(refchs, wr).push(mags, iqs)], axis=1)

    # jitted chain (same channelizer outputs, so this isolates demod quality)
    backend = default_demod_backend() if args.backend == "auto" else args.backend
    fn = demod_block_pallas if backend == "pallas" else demod_block
    params = make_channel_params(specs, wave_rate=wr, sample_rate=FS, center_freq=CENTER, fft_size=N)
    c2p = lambda z: np.stack([z.real, z.imag], -1).astype(np.float32)
    state = init_demod_state(C, mags[:, :A].T, c2p(iqs[:, :A].T))
    blocks = []
    for k in range(n_blocks):
        lo = A + k * W
        state, audio, _iq, _o = fn(params, state, jnp.asarray(mags[:, lo : lo + W].T), jnp.asarray(c2p(iqs[:, lo : lo + W].T)))
        blocks.append(np.asarray(audio).T)
    jax_audio = np.concatenate(blocks, axis=1)

    m = min(ref_audio.shape[1], jax_audio.shape[1])
    ref, got = ref_audio[:, :m], jax_audio[:, :m]
    snrs = []
    for c in range(C):
        sig = float(np.mean(ref[c] ** 2))
        err = float(np.mean((ref[c] - got[c]) ** 2))
        snrs.append(float("inf") if err == 0 else 10 * np.log10(max(sig, 1e-30) / err))
    gating_equal = bool(np.array_equal(ref != 0, got != 0))
    print(json.dumps({
        "metric": "audio_snr_vs_refmodel",
        "backend": backend,
        "per_channel_snr_db": [round(s, 1) if np.isfinite(s) else "inf" for s in snrs],
        "worst_snr_db": round(min(snrs), 1) if np.isfinite(min(snrs)) else "inf",
        "squelch_gating_identical": gating_equal,
        "samples_compared": int(m) * C,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
