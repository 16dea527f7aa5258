"""Behavioral tests of the scalar NumPy reference model.

Ports the *intent* of the reference unit tests (reference: src/test_squelch.cpp,
src/test_ctcss.cpp) to our refmodel: the refmodel is the golden against which
the TPU kernels are asserted, so it must itself behave like the reference.
"""

import numpy as np
import pytest

from rtlsdr_airband_tpu.refmodel.channel_ref import (
    ChannelRef,
    ChannelRefConfig,
    ChannelizerRef,
    DeviceRef,
    bin_for_freq,
)
from rtlsdr_airband_tpu.refmodel.ctcss_ref import CTCSSRef
from rtlsdr_airband_tpu.refmodel.squelch_ref import CLOSED, OPEN, SquelchRef
from rtlsdr_airband_tpu.utils.siggen import (
    SignalGen,
    am_carrier_iq,
    complex_noise,
    nfm_carrier_iq,
)

WAVE_RATE = 8000


def run_noise(sq, rng, n, sigma=2.0, mean=0.0):
    for _ in range(n):
        sq.process_raw_sample(mean + abs(rng.normal(0, sigma)))


class TestSquelchRef:
    def test_noise_floor_converges(self):
        # reference: test_squelch.cpp noise-floor convergence intent
        sq = SquelchRef()
        rng = np.random.default_rng(7)
        run_noise(sq, rng, 16000, sigma=2.0)
        nf1 = float(sq.noise_floor)
        run_noise(sq, rng, 16000, sigma=2.0)
        nf2 = float(sq.noise_floor)
        assert abs(nf2 - nf1) / nf1 < 0.25
        assert sq.current_state == CLOSED
        assert sq.open_count == 0

    def test_opens_on_signal_and_closes_after(self):
        sq = SquelchRef()
        rng = np.random.default_rng(0)
        run_noise(sq, rng, 8000, sigma=2.0)
        assert not sq.is_open()
        opened_at = None
        for i in range(2000):
            sq.process_raw_sample(50.0 + abs(rng.normal(0, 2.0)))
            if sq.is_open():
                opened_at = i
                break
        assert opened_at is not None
        # open delay is 197 samples (reference: squelch.cpp:49)
        assert 190 <= opened_at <= 400
        assert sq.open_count == 1
        closed_at = None
        for i in range(2000):
            sq.process_raw_sample(abs(rng.normal(0, 2.0)))
            if not sq.is_open():
                closed_at = i
                break
        # low-signal abort fires after 88 consecutive low samples
        assert closed_at is not None and closed_at <= 500

    def test_tolerates_short_dead_spot(self):
        # reference: test_squelch.cpp dead-spot tolerance intent
        sq = SquelchRef()
        rng = np.random.default_rng(3)
        run_noise(sq, rng, 8000, sigma=2.0)
        for _ in range(1000):
            sq.process_raw_sample(50.0 + abs(rng.normal(0, 2.0)))
        assert sq.is_open()
        # 40 samples of dropout (< low_signal_abort=88) must not close squelch
        for _ in range(40):
            sq.process_raw_sample(abs(rng.normal(0, 2.0)))
        assert sq.is_open()
        for _ in range(300):
            sq.process_raw_sample(50.0 + abs(rng.normal(0, 2.0)))
        assert sq.is_open()
        assert sq.open_count == 1

    def test_manual_threshold(self):
        sq = SquelchRef()
        sq.set_squelch_level_threshold(30.0)
        rng = np.random.default_rng(5)
        for _ in range(3000):
            sq.process_raw_sample(20.0 + abs(rng.normal(0, 1.0)))
        assert not sq.is_open()
        for _ in range(600):
            sq.process_raw_sample(45.0 + abs(rng.normal(0, 1.0)))
        assert sq.is_open()

    def test_ctcss_gates_open(self):
        # reference: test_squelch.cpp CTCSS-gated open intent
        def run(tone_freq):
            sq = SquelchRef()
            sq.set_ctcss_freq(100.0, WAVE_RATE)
            rng = np.random.default_rng(11)
            run_noise(sq, rng, 8000, sigma=2.0)
            gen = SignalGen(WAVE_RATE).add_tone(tone_freq, 0.3).add_noise(0.05)
            audio = gen.render(6000)
            opened = False
            for i in range(6000):
                sq.process_raw_sample(50.0 + abs(rng.normal(0, 2.0)))
                if sq.should_process_audio():
                    sq.process_audio_sample(audio[i])
                opened = opened or sq.is_open()
            return opened

        assert run(100.0)  # matching tone opens
        assert not run(151.4)  # wrong tone never opens


class TestCTCSSRef:
    @pytest.mark.parametrize("target,tone,expect", [(100.0, 100.0, True), (100.0, 151.4, False), (67.0, 67.0, True), (254.1, 100.0, False)])
    def test_tone_detection(self, target, tone, expect):
        # reference: test_ctcss.cpp cross-matrix intent (subset; full matrix in slow test)
        det = CTCSSRef(target, WAVE_RATE, int(WAVE_RATE * 0.4))
        gen = SignalGen(WAVE_RATE).add_tone(tone, 0.3).add_noise(0.1)
        audio = gen.render(int(WAVE_RATE * 0.9))
        for s in audio:
            det.process_audio_sample(s)
        assert det.enough_samples
        assert det.has_tone == expect

    @pytest.mark.slow
    def test_full_matrix(self):
        from rtlsdr_airband_tpu.ops.goertzel import STANDARD_TONES

        window = int(WAVE_RATE * 0.4)
        # reference test_ctcss.cpp:66-110 semantics: a detector must fire for
        # its own tone and reject all tones >= 5 Hz away; detectors within
        # +/-5 Hz of the input tone (other than the exact target) are skipped
        # (the reference makes no assertion about them).
        for target in STANDARD_TONES[::10]:
            det = CTCSSRef(float(target), WAVE_RATE, window)
            for tone in STANDARD_TONES:
                if abs(target - tone) < 5 and target != tone:
                    continue
                det.reset()
                audio = SignalGen(WAVE_RATE).add_tone(float(tone), 0.3).add_noise(0.05).render(window + 10)
                for s in audio:
                    det.process_audio_sample(s)
                expect = target == tone
                assert det.has_tone == expect, f"target={target} tone={tone}"


class TestEndToEndRef:
    FS = 2_560_000
    N = 512

    def _am_scene(self, wr, freq, center, audio):
        n = int(self.FS * len(audio) / wr)
        iq = am_carrier_iq(self.FS, freq - center, n, audio=audio, carrier_ampl=0.4, mod_index=0.8, audio_rate=wr)
        return iq + complex_noise(n, 0.01, seed=1)

    def test_am_tone_recovered(self):
        wr = 8000
        center, freq = 120_000_000, 120_400_000
        audio = SignalGen(wr).add_tone(1000.0, 0.5).render(wr)
        iq = self._am_scene(wr, freq, center, audio)
        b = bin_for_freq(freq, center, self.FS, self.N)
        chan = ChannelizerRef(self.N, self.FS, wr, np.array([b]))
        ch = ChannelRef(ChannelRefConfig(modulation="am", frequency=freq), wr, self.N, self.FS, center)
        dev = DeviceRef([ch], wr)
        mags, iqs = chan.push(iq)
        batches = dev.push(mags, iqs)
        out = np.concatenate([bb[0][0] for bb in batches])
        seg = out[3000:7000]
        assert (seg != 0).mean() > 0.9
        spec = np.abs(np.fft.rfft((seg - seg.mean()) * np.hanning(len(seg))))
        f = np.fft.rfftfreq(len(seg), 1 / wr)
        assert abs(f[spec.argmax()] - 1000.0) < 5
        assert spec.max() / np.median(spec) > 100

    def test_nfm_tone_recovered(self):
        wr = 16000
        center, freq = 150_000_000, 150_300_000
        audio = SignalGen(wr).add_tone(800.0, 0.8).render(wr)
        n = int(self.FS * 1.0)
        iq = nfm_carrier_iq(self.FS, freq - center, n, audio=audio, deviation_hz=2500.0, carrier_ampl=0.4, audio_rate=wr)
        iq = iq + complex_noise(n, 0.01, seed=2)
        b = bin_for_freq(freq, center, self.FS, self.N)
        chan = ChannelizerRef(self.N, self.FS, wr, np.array([b]))
        ch = ChannelRef(ChannelRefConfig(modulation="nfm", frequency=freq, bandwidth=8000), wr, self.N, self.FS, center)
        dev = DeviceRef([ch], wr)
        mags, iqs = chan.push(iq)
        batches = dev.push(mags, iqs)
        out = np.concatenate([bb[0][0] for bb in batches])
        seg = out[6000:14000]
        assert (seg != 0).mean() > 0.95
        spec = np.abs(np.fft.rfft((seg - seg.mean()) * np.hanning(len(seg))))
        f = np.fft.rfftfreq(len(seg), 1 / wr)
        assert abs(f[spec.argmax()] - 800.0) < 5
        assert spec.max() / np.median(spec) > 100

    def test_squelch_closed_silence(self):
        wr = 8000
        center = 120_000_000
        n = self.FS // 2
        iq = complex_noise(n, 0.02, seed=9)
        b = bin_for_freq(120_400_000, center, self.FS, self.N)
        chan = ChannelizerRef(self.N, self.FS, wr, np.array([b]))
        ch = ChannelRef(ChannelRefConfig(modulation="am", frequency=120_400_000), wr, self.N, self.FS, center)
        dev = DeviceRef([ch], wr)
        mags, iqs = chan.push(iq)
        batches = dev.push(mags, iqs)
        out = np.concatenate([bb[0][0] for bb in batches])
        # first AGC_EXTRA samples are the reference's 0.5 waveout init; rest silent
        assert np.all(out[100:] == 0.0)
