"""Golden tests against the REFERENCE C++ DSP, compiled from the read-only
reference tree (no sources copied) via tests/golden/ref_harness.cpp.

This anchors the whole parity chain: the TPU kernels are tested against the
NumPy refmodel (tests/test_refmodel.py, test_demod_golden.py,
test_demod_pallas.py); here the refmodel itself is tested sample-by-sample
against the actual reference implementation of the squelch state machine
(squelch.cpp), CTCSS tone squelch (ctcss.cpp) and the Bessel lowpass / notch
biquads (filters.cpp).

Skipped when g++ or the reference tree is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from rtlsdr_airband_tpu.refmodel.filters_ref import LowpassFilterRef, NotchFilterRef
from rtlsdr_airband_tpu.refmodel.squelch_ref import SquelchRef
from rtlsdr_airband_tpu.utils.siggen import SignalGen

REF_SRC = "/root/reference/src"
HARNESS_SRC = os.path.join(os.path.dirname(__file__), "golden", "ref_harness.cpp")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not os.path.isdir(REF_SRC),
    reason="needs g++ and the reference tree",
)


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    exe = str(tmp_path_factory.mktemp("refgold") / "ref_harness")
    subprocess.run(
        ["g++", "-O2", "-std=c++11", f"-I{REF_SRC}", "-o", exe, HARNESS_SRC]
        + [os.path.join(REF_SRC, f) for f in ("squelch.cpp", "ctcss.cpp", "filters.cpp")],
        check=True, capture_output=True,
    )
    return exe


def run_cpp_squelch(exe, raw, filtered=None, audio=None, args=()):
    n = len(raw)
    data = np.zeros((n, 3), np.float32)
    data[:, 0] = raw
    if filtered is not None:
        data[:, 1] = filtered
    if audio is not None:
        data[:, 2] = audio
    p = subprocess.run([exe, "squelch", *args], input=data.tobytes(), capture_output=True, check=True)
    rec = np.frombuffer(p.stdout[:-32], dtype=np.dtype([("flags", "u1"), ("nl", "<f4"), ("sl", "<f4")]))
    trailer = np.frombuffer(p.stdout[-32:], dtype="<u8")
    assert len(rec) == n
    return rec, trailer


def run_py_squelch(raw, filtered=None, audio=None, snr_db=None, level=None, ctcss=None, rate=8000.0, postfilter=False):
    sq = SquelchRef()
    if level is not None:
        sq.set_squelch_level_threshold(level)
    elif snr_db is not None:
        sq.set_squelch_snr_threshold(snr_db)
    if ctcss:
        sq.set_ctcss_freq(ctcss, rate)
    flags = np.zeros(len(raw), np.uint8)
    nl = np.zeros(len(raw), np.float32)
    sl = np.zeros(len(raw), np.float32)
    for i, s in enumerate(raw):
        sq.process_raw_sample(np.float32(s))
        f = 0
        if sq.should_filter_sample():
            f |= 2
            if postfilter:
                sq.process_filtered_sample(np.float32(filtered[i]))
        spa = sq.should_process_audio()
        if spa:
            f |= 16
        if ctcss and spa:
            sq.process_audio_sample(np.float32(audio[i]))
        if sq.is_open():
            f |= 1
        if sq.first_open_sample():
            f |= 4
        if sq.last_open_sample():
            f |= 8
        flags[i] = f
        nl[i] = sq.noise_level()
        sl[i] = sq.signal_level()
    return flags, nl, sl, sq


def make_bursty_signal(n, seed=0, rate=8000):
    """Noise floor with a strong burst in the middle (opens then closes)."""
    rng = np.random.default_rng(seed)
    raw = np.abs(rng.normal(0, 1.0, n)).astype(np.float32)
    burst = slice(int(n * 0.35), int(n * 0.65))
    raw[burst] += 8.0
    return raw


class TestSquelchGolden:
    def test_snr_threshold_burst(self, harness):
        raw = make_bursty_signal(16000, seed=1)
        rec, tr = run_cpp_squelch(harness, raw, args=("9.54",))
        flags, nl, sl, sq = run_py_squelch(raw, snr_db=9.54)
        assert np.array_equal(rec["flags"], flags)
        np.testing.assert_allclose(rec["nl"], nl, rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(rec["sl"], sl, rtol=2e-5, atol=1e-7)
        assert tr[0] == sq.open_count and tr[1] == sq.flappy_count
        assert (flags & 1).any(), "squelch never opened in scenario"

    def test_manual_level(self, harness):
        raw = make_bursty_signal(12000, seed=2)
        rec, tr = run_cpp_squelch(harness, raw, args=("level:4.0",))
        flags, nl, sl, sq = run_py_squelch(raw, level=4.0)
        assert np.array_equal(rec["flags"], flags)
        np.testing.assert_allclose(rec["nl"], nl, rtol=2e-5, atol=1e-7)
        assert tr[0] == sq.open_count

    def test_postfilter_path(self, harness):
        raw = make_bursty_signal(12000, seed=3)
        rng = np.random.default_rng(4)
        filtered = (raw * 0.8 + np.abs(rng.normal(0, 0.1, len(raw)))).astype(np.float32)
        rec, tr = run_cpp_squelch(harness, raw, filtered=filtered, args=("9.54", "postfilter"))
        flags, nl, sl, sq = run_py_squelch(raw, filtered=filtered, snr_db=9.54, postfilter=True)
        assert np.array_equal(rec["flags"], flags)
        np.testing.assert_allclose(rec["nl"], nl, rtol=2e-5, atol=1e-7)

    @pytest.mark.parametrize("tx_tone,expect_open", [(100.0, True), (151.4, False)])
    def test_ctcss_gating(self, harness, tx_tone, expect_open):
        rate = 8000
        n = 3 * rate
        raw = np.abs(np.random.default_rng(5).normal(0, 1.0, n)).astype(np.float32)
        raw[rate:] += 8.0  # carrier on after 1 s
        audio = SignalGen(rate, seed=6).add_tone(tx_tone, 0.3).add_noise(0.05).render(n)
        rec, tr = run_cpp_squelch(harness, raw, audio=audio, args=("9.54", "ctcss", "100.0", str(rate)))
        flags, nl, sl, sq = run_py_squelch(raw, audio=audio, snr_db=9.54, ctcss=100.0, rate=rate)
        assert np.array_equal(rec["flags"], flags)
        assert tr[2] == sq.ctcss_count() and tr[3] == sq.no_ctcss_count()
        assert bool((flags & 1).any()) == expect_open


class TestFiltersGolden:
    def test_lowpass(self, harness):
        rng = np.random.default_rng(7)
        n = 4000
        iq = rng.normal(0, 0.5, (n, 2)).astype(np.float32)
        p = subprocess.run([harness, "lowpass", "3000", "8000"], input=iq.tobytes(), capture_output=True, check=True)
        cpp = np.frombuffer(p.stdout, "<f4").reshape(n, 2)
        lp = LowpassFilterRef(3000.0, 8000.0)
        py = np.zeros_like(iq)
        for i in range(n):
            r, j = lp.apply(np.float32(iq[i, 0]), np.float32(iq[i, 1]))
            py[i] = (r, j)
        scale = np.abs(cpp).max()
        assert np.abs(cpp - py).max() / scale < 1e-5

    def test_notch(self, harness):
        n = 4000
        x = SignalGen(8000, seed=8).add_tone(1000.0, 0.5).add_tone(300.0, 0.3).add_noise(0.05).render(n)
        p = subprocess.run([harness, "notch", "1000", "8000", "10"], input=x.tobytes(), capture_output=True, check=True)
        cpp = np.frombuffer(p.stdout, "<f4")
        nf = NotchFilterRef(1000.0, 8000.0, 10.0)
        py = np.array([nf.apply(np.float32(v)) for v in x], np.float32)
        scale = np.abs(cpp).max()
        assert np.abs(cpp - py).max() / scale < 1e-5
