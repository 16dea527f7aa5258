"""Scan controller + AFC tracker behavior (reference: src/rtl_airband.cpp
controller_thread :101-139, class AFC :180-251)."""

import numpy as np

from rtlsdr_airband_tpu.runtime.control import (
    SCAN_DC_OFFSET_BINS,
    SCAN_HOPS_AFTER,
    AFCTracker,
    ScanController,
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


def make_scan(freqs=(118_000_000, 121_500_000, 124_000_000)):
    clk = FakeClock()
    sc = ScanController(list(freqs), None, sample_rate=2_560_000, fft_size=512, clock=clk)
    return sc, clk


def test_scan_hops_after_10_idle_checks():
    sc, clk = make_scan()
    hops = []
    for _ in range(25):
        clk.t += 0.21
        r = sc.tick(False)
        if r is not None:
            hops.append((sc.st.freq_idx, r))
    # 25 checks -> 2 hops (after 10 and 20)
    assert len(hops) == 2
    assert hops[0][0] == 1
    bin_w = 2_560_000 / 512
    assert hops[0][1] == int(121_500_000 + SCAN_DC_OFFSET_BINS * bin_w)


def test_scan_activity_resets_counter_and_tags():
    sc, clk = make_scan()
    for _ in range(SCAN_HOPS_AFTER - 1):
        clk.t += 0.21
        assert sc.tick(False) is None
    clk.t += 0.21
    assert sc.tick(True) is None  # activity: no hop
    assert sc.st.no_signal_checks == 0
    clk.t += 10
    assert sc.tag_queue.get(3.0) == 0  # tag queued for freq 0


def test_scan_checks_rate_limited():
    sc, clk = make_scan()
    for _ in range(100):  # no time advance: only first tick counts
        sc.tick(False)
    assert sc.st.no_signal_checks <= 1


def test_afc_disabled_passthrough():
    t = AFCTracker(base_bin=100, afc=0, fft_size=512)
    assert t.finalize(True, None) == 100
    assert t.indicator == "*"


def _power_with_peak(peak_bin, base_bin, fft_size=512):
    p = np.full(fft_size, 0.1, np.float32)
    # smooth hill from base_bin to peak_bin
    lo, hi = min(peak_bin, base_bin), max(peak_bin, base_bin)
    for i, b in enumerate(range(lo, hi + 1)):
        p[b] = 1.0 + i if peak_bin > base_bin else 1.0 + (hi - lo - i)
    p[base_bin] = 1.0
    return p


def test_afc_climbs_to_peak_on_open():
    t = AFCTracker(base_bin=100, afc=2, fft_size=512)
    power = _power_with_peak(103, 100)
    b = t.finalize(True, power)
    assert b == 103
    assert t.indicator == ">"


def test_afc_climbs_down():
    t = AFCTracker(base_bin=100, afc=2, fft_size=512)
    power = _power_with_peak(97, 100)
    b = t.finalize(True, power)
    assert b == 97
    assert t.indicator == "<"


def test_afc_reverts_on_close():
    t = AFCTracker(base_bin=100, afc=2, fft_size=512)
    t.finalize(True, _power_with_peak(103, 100))
    assert t.current_bin == 103
    b = t.finalize(False, None)
    assert b == 100
    assert t.indicator == " "


def test_afc_only_on_opening_edge():
    t = AFCTracker(base_bin=100, afc=2, fft_size=512)
    t.finalize(True, _power_with_peak(103, 100))
    # already open: spectrum changes must not retune
    b = t.finalize(True, _power_with_peak(97, 100))
    assert b == 103
