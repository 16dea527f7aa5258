"""Golden tests: the fused JAX demod kernel vs the scalar NumPy refmodel.

Both consume identical channelizer outputs; audio, IQ taps, squelch gating
and all carried state must agree (float32 to ~1e-5, int/bool exactly),
including across block boundaries (state carry).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from rtlsdr_airband_tpu.constants import AGC_EXTRA
from rtlsdr_airband_tpu.ops.demod import demod_block
from rtlsdr_airband_tpu.ops.params import ChannelSpec, init_demod_state, make_channel_params
from rtlsdr_airband_tpu.refmodel.channel_ref import (
    ChannelRef,
    ChannelRefConfig,
    ChannelizerRef,
    DeviceRef,
    bin_for_freq,
)
from rtlsdr_airband_tpu.utils.siggen import SignalGen, am_carrier_iq, complex_noise, nfm_carrier_iq

FS = 2_560_000
N = 512
CENTER = 120_000_000


def build_scene(wr, specs, dur, seed=0, tx_ctcss=None):
    n = int(FS * dur)
    iq = complex_noise(n, 0.02, seed=seed)
    for i, s in enumerate(specs):
        gen = SignalGen(wr, seed=seed + i).add_tone(700.0 + 150 * i, 0.5).add_noise(0.02)
        tone = tx_ctcss if tx_ctcss is not None else (s.ctcss if s.ctcss > 0 else 0)
        if tone:
            gen.add_tone(tone, 0.25)
        audio = gen.render(int(wr * dur))
        if s.modulation == "am":
            c = am_carrier_iq(FS, s.frequency - CENTER, n, audio=audio, carrier_ampl=0.35, mod_index=0.8, audio_rate=wr)
        else:
            c = nfm_carrier_iq(FS, s.frequency - CENTER, n, audio=audio, deviation_hz=2500.0, carrier_ampl=0.35, audio_rate=wr)
        gate = np.zeros(n, np.float32)
        gate[int(n * 0.15) : int(n * 0.8)] = 1.0
        iq = iq + c * gate
    return iq.astype(np.complex64)


def c2p(z):
    """complex -> trailing [re, im] f32 pairs (jit-boundary representation)."""
    z = np.asarray(z)
    return np.stack([z.real, z.imag], axis=-1).astype(np.float32)


def p2c(p):
    p = np.asarray(p)
    return (p[..., 0] + 1j * p[..., 1]).astype(np.complex64)


def run_both(wr, specs_kw, dur=1.0, tx_ctcss=None):
    specs = [ChannelSpec(**kw) for kw in specs_kw]
    C = len(specs)
    bins = np.array([bin_for_freq(s.frequency, CENTER, FS, N) for s in specs], np.int32)
    iq_scene = build_scene(wr, specs, dur, tx_ctcss=tx_ctcss)
    chanzr = ChannelizerRef(N, FS, wr, bins)
    mags, iqs = chanzr.push(iq_scene)
    G = mags.shape[1]
    W, A = wr // 8, AGC_EXTRA
    n_blocks = (G - A) // W
    assert n_blocks >= 3, "need multiple blocks to exercise state carry"

    refchs = []
    for kw in specs_kw:
        cfg = ChannelRefConfig(**{k: v for k, v in kw.items() if k in ChannelRefConfig.__dataclass_fields__})
        refchs.append(ChannelRef(cfg, wr, N, FS, CENTER))
    dev = DeviceRef(refchs, wr)
    ref_batches = dev.push(mags, iqs)
    ref_audio = np.concatenate([b[0] for b in ref_batches], axis=1)
    ref_iqout = np.concatenate([b[1] for b in ref_batches], axis=1)

    params = make_channel_params(specs, wave_rate=wr, sample_rate=FS, center_freq=CENTER, fft_size=N)
    state = init_demod_state(C, mags[:, :A].T, c2p(iqs[:, :A].T))
    audio_blocks, iq_blocks = [], []
    for k in range(n_blocks):
        lo = A + k * W
        state, audio, iqo, _open = demod_block(params, state, jnp.asarray(mags[:, lo : lo + W].T), jnp.asarray(c2p(iqs[:, lo : lo + W].T)))
        audio_blocks.append(np.asarray(audio).T)
        iq_blocks.append(p2c(iqo).T)
    jax_audio = np.concatenate(audio_blocks, axis=1)
    jax_iqout = np.concatenate(iq_blocks, axis=1)
    n = min(ref_audio.shape[1], jax_audio.shape[1])
    return (ref_audio[:, :n], jax_audio[:, :n], ref_iqout[:, :n], jax_iqout[:, :n], refchs, state)


def assert_match(ref_audio, jax_audio, ref_iq, jax_iq, refchs, state, atol=2e-5):
    # audio numerically close, squelch gating identical
    assert np.abs(ref_audio - jax_audio).max() < atol
    assert np.array_equal(ref_audio != 0, jax_audio != 0)
    assert np.abs(ref_iq - jax_iq).max() < 5e-4
    # all integer squelch state identical at the end
    for c, rch in enumerate(refchs):
        sq = rch.squelch
        assert int(state.cur[c]) == sq.current_state
        assert int(state.nxt[c]) == sq.next_state
        assert int(state.open_count[c]) == sq.open_count
        assert int(state.sample_count[c]) == sq.sample_count
        assert int(state.delay[c]) == sq.delay
        assert int(state.low_signal_count[c]) == sq.low_signal_count
        assert int(state.recent_open_count[c]) == sq.recent_open_count
        assert int(state.flappy_count[c]) == sq.flappy_count
        np.testing.assert_allclose(float(state.noise_floor[c]), sq.noise_floor, rtol=1e-5)
        np.testing.assert_allclose(float(state.agc[c]), rch.agcavgfast, rtol=1e-4)


class TestDemodGolden:
    def test_am_basic(self):
        assert_match(*run_both(8000, [
            dict(frequency=120_400_000, modulation="am"),
            dict(frequency=120_700_000, modulation="am", ampfactor=1.2),
        ]))

    def test_am_lowpass_notch_manual_iqout(self):
        assert_match(*run_both(8000, [
            dict(frequency=120_400_000, modulation="am", bandwidth=6000, notch=1000.0, has_iq_outputs=True),
            dict(frequency=120_700_000, modulation="am", squelch_threshold_dbfs=-40.0),
        ]))

    def test_nfm(self):
        assert_match(*run_both(16000, [
            dict(frequency=120_300_000, modulation="nfm", bandwidth=8000),
            dict(frequency=120_900_000, modulation="nfm"),
        ]))

    def test_nfm_ctcss(self):
        assert_match(*run_both(16000, [
            dict(frequency=120_300_000, modulation="nfm", ctcss=100.0),
        ]))

    def test_ctcss_wrong_tone_blocks(self):
        # carrier strong but CTCSS tone absent -> squelch must stay silent
        ref_a, jax_a, _, _, refchs, state = run_both(16000, [
            dict(frequency=120_300_000, modulation="nfm", ctcss=151.4),
        ], tx_ctcss=100.0)
        assert np.all(jax_a[:, AGC_EXTRA:] == 0.0)
        assert np.array_equal(ref_a != 0, jax_a != 0)


class TestChannelizer:
    def test_matmul_and_fft_match_ref(self):
        from rtlsdr_airband_tpu.ops.channelizer import channelize_fft, channelize_matmul
        from rtlsdr_airband_tpu.ops.window import blackman_harris_7

        wr, n_frames = 8000, 64
        hop = round(FS / wr)
        L = (n_frames - 1) * hop + N
        x = (am_carrier_iq(FS, 400_000, L) + complex_noise(L, 0.05, 3)).astype(np.complex64)
        bins = np.array([79, 100, 59], np.int32)
        win = blackman_harris_7(N)
        ref = ChannelizerRef(N, FS, wr, bins)
        mags_r, iqs_r = ref.push(x)
        xp = jnp.asarray(c2p(x))
        m1, z1 = channelize_matmul(xp, jnp.asarray(bins), jnp.asarray(win), hop=hop, fft_size=N, n_frames=n_frames)
        m2, z2 = channelize_fft(xp, jnp.asarray(bins), jnp.asarray(win), hop=hop, fft_size=N, n_frames=n_frames)
        scale = np.abs(iqs_r).max()
        assert np.abs(p2c(z1).T - iqs_r).max() / scale < 1e-5
        assert np.abs(p2c(z2).T - iqs_r).max() / scale < 1e-5
        assert np.abs(np.asarray(m1).T - mags_r).max() / mags_r.max() < 1e-5

    def test_decode_raw_iq(self):
        from rtlsdr_airband_tpu.ops.channelizer import decode_raw_iq
        from rtlsdr_airband_tpu.ops.sampleconv import SampleFormat, decode_iq, iq_to_complex

        raw = np.random.default_rng(0).integers(0, 256, 4096, dtype=np.uint8)
        want = iq_to_complex(decode_iq(raw.tobytes(), SampleFormat.U8))
        got = p2c(np.asarray(decode_raw_iq(jnp.asarray(raw), "u8", 127.5)))
        np.testing.assert_allclose(got, want, atol=1e-7)
