#!/usr/bin/env python
"""Squelch debug trace — the analog of the reference's DEBUG_SQUELCH binary
trace + numpy reader (reference: squelch.cpp:520-581).

Runs an IQ recording (or a synthetic scene with --synth) through one channel
of the pipeline with the demod scan in trace mode and writes a .npz with the
per-sample squelch internals: current/next state, noise floor, capped pre-
filter moving average, squelch delay counter, AGC, and the emitted audio.

    python scripts/squelch_trace.py --synth trace.npz
    python scripts/squelch_trace.py recording.cu8 --freq 120.4e6 \
        --center 120.0e6 --rate 2.56e6 --format u8 trace.npz

Read it back with:

    d = numpy.load("trace.npz")
    # d["cur"], d["nxt"]  int32 squelch state per audio sample
    #   (0 CLOSED, 1 OPENING, 2 CLOSING, 3 LOW_SIGNAL_ABORT, 4 OPEN)
    # d["noise_floor"], d["pre_capped"], d["agc"] float32
    # d["delay"] int32
    # d["waveout"]  raw scan output, index-aligned with the state series
    # d["audio"]    emitted audio (tail-carried + AM fade-out applied);
    #               audio[j] corresponds to scan/state index j - AGC_EXTRA

and plot e.g.:

    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(3, sharex=True)
    ax[0].plot(d["pre_capped"]); ax[0].plot(d["noise_floor"])
    ax[1].plot(d["cur"]); ax[2].plot(d["waveout"])
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("input", nargs="?", help="raw IQ recording (omit with --synth)")
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--synth", action="store_true", help="use a synthetic AM scene instead of a recording")
    ap.add_argument("--freq", type=float, default=120.4e6)
    ap.add_argument("--center", type=float, default=120.0e6)
    ap.add_argument("--rate", type=float, default=2.56e6)
    ap.add_argument("--format", default="u8", choices=["u8", "s8", "s16", "f32"])
    ap.add_argument("--modulation", default="am", choices=["am", "nfm"])
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from rtlsdr_airband_tpu.constants import AGC_EXTRA
    from rtlsdr_airband_tpu.ops.demod import demod_block
    from rtlsdr_airband_tpu.ops.params import ChannelSpec, init_demod_state, make_channel_params
    from rtlsdr_airband_tpu.ops.sampleconv import SampleFormat, decode_iq
    from rtlsdr_airband_tpu.refmodel.channel_ref import bin_for_freq
    from rtlsdr_airband_tpu.runtime.pipeline import channelize_block
    from rtlsdr_airband_tpu.ops.window import blackman_harris_7

    fs = int(args.rate)
    wr = 8000 if args.modulation == "am" else 16000
    N = 512
    if args.synth:
        from rtlsdr_airband_tpu.utils.siggen import am_carrier_iq, complex_noise

        n = int(fs * args.seconds)
        z = complex_noise(n, 0.02, 0)
        t = np.arange(int(wr * args.seconds)) / wr
        audio = (0.5 * np.sin(2 * np.pi * 800.0 * t)).astype(np.float32)
        gate = np.zeros(n, np.float32)
        gate[int(n * 0.2) : int(n * 0.8)] = 1.0
        z = z + gate * am_carrier_iq(fs, args.freq - args.center, n, audio=audio, carrier_ampl=0.35, audio_rate=wr)
        x = np.stack([z.real, z.imag], -1).astype(np.float32)
    else:
        raw = np.fromfile(args.input, dtype={"u8": np.uint8, "s8": np.uint8, "s16": np.int16, "f32": np.float32}[args.format])
        x = decode_iq(raw.tobytes() if args.format in ("u8", "s8") else raw, SampleFormat(args.format))

    hop = round(fs / wr)
    W = wr // 8
    A = AGC_EXTRA
    spec = ChannelSpec(frequency=int(args.freq), modulation=args.modulation)
    params = make_channel_params([spec], wave_rate=wr, sample_rate=fs, center_freq=int(args.center), fft_size=N)
    bins = jnp.asarray(np.array([bin_for_freq(int(args.freq), int(args.center), fs, N)], np.int32))
    window = jnp.asarray(blackman_harris_7(N))

    prime_len = (A - 1) * hop + N
    mags0, iqs0 = channelize_block(jnp.asarray(x[:prime_len]), bins, window, hop=hop, fft_size=N, n_frames=A)
    state = init_demod_state(1, mags0, iqs0)
    pos = A * hop

    rows = {k: [] for k in ("cur", "nxt", "noise_floor", "pre_capped", "agc", "delay", "waveout", "audio")}
    block_len = (W - 1) * hop + N
    while pos + block_len <= len(x):
        mags, iqs = channelize_block(jnp.asarray(x[pos : pos + block_len]), bins, window, hop=hop, fft_size=N, n_frames=W)
        state, audio_b, _iq, _open, tr = demod_block(params, state, mags, iqs, trace=True)
        keymap = {"noise_floor": "nf"}
        for k in rows:
            src = audio_b if k == "audio" else tr[keymap.get(k, k)]
            rows[k].append(np.asarray(src)[:, 0])
        pos += W * hop

    if not rows["cur"]:
        print("input too short for one block", file=sys.stderr)
        return 1
    np.savez(args.out, **{k: np.concatenate(v) for k, v in rows.items()})
    n_samp = sum(len(v) for v in rows["cur"])
    print(f"wrote {args.out}: {n_samp} audio samples x {len(rows)} series")
    return 0


if __name__ == "__main__":
    sys.exit(main())
