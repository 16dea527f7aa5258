"""Mixer behavior vs reference semantics (src/mixer.cpp)."""

import numpy as np
import pytest

from rtlsdr_airband_tpu.runtime.mixer import MIX_DIVISOR, Mixer


W = 100


def test_connect_gain_staging():
    # reference: mixer_connect_input (mixer.cpp:81-85)
    m = Mixer("m", W)
    m.connect_input(ampfactor=2.0, balance=0.0)
    assert not m.stereo
    i = m.connect_input(ampfactor=1.0, balance=0.5)
    assert m.stereo
    assert m.inputs[i].ampl == pytest.approx(0.5)
    assert m.inputs[i].ampr == pytest.approx(1.0)
    i = m.connect_input(ampfactor=1.0, balance=-0.25)
    assert m.inputs[i].ampl == pytest.approx(1.0)
    assert m.inputs[i].ampr == pytest.approx(0.75)


def test_balance_range_rejected():
    m = Mixer("m", W)
    with pytest.raises(ValueError):
        m.connect_input(balance=1.5)


def test_mono_mix_weighted_sum():
    m = Mixer("m", W)
    a = m.connect_input(ampfactor=1.0)
    b = m.connect_input(ampfactor=0.5)
    m.put_samples(a, np.full(W, 0.2, np.float32), True)
    m.put_samples(b, np.full(W, 0.4, np.float32), True)
    out = m.poll()
    assert out is not None and out.shape == (W,)
    np.testing.assert_allclose(out, 0.2 + 0.5 * 0.4, rtol=1e-6)


def test_stereo_mix_balance():
    m = Mixer("m", W)
    a = m.connect_input(balance=1.0)  # full right: ampl=0, ampr=1
    m.put_samples(a, np.ones(W, np.float32), True)
    out = m.poll()
    assert out.shape == (W, 2)
    np.testing.assert_allclose(out[:, 0], 0.0)
    np.testing.assert_allclose(out[:, 1], 1.0)


def test_deadline_tolerance_and_silence_fill():
    # late input: emitted anyway once interval counts down, missing input
    # contributes silence (reference: mixer.cpp:153-156)
    m = Mixer("m", W)
    a = m.connect_input()
    m.connect_input()  # never delivers
    m.put_samples(a, np.ones(W, np.float32), True)
    polls = []
    for _ in range(MIX_DIVISOR + 1):
        polls.append(m.poll())
    emitted = [p for p in polls if p is not None]
    assert len(emitted) == 1
    np.testing.assert_allclose(emitted[0], 1.0)


def test_input_overrun_counted():
    m = Mixer("m", W)
    a = m.connect_input()
    m.put_samples(a, np.ones(W, np.float32), True)
    m.put_samples(a, np.ones(W, np.float32), True)  # not yet consumed
    assert m.inputs[a].overrun_count == 1


def test_output_overrun_when_not_consumed():
    m = Mixer("m", W)
    a = m.connect_input()
    m.put_samples(a, np.ones(W, np.float32), True)
    assert m.poll() is not None
    # consumer never calls output_consumed(); after MIX_DIVISOR more polls
    # with a fresh input the mixer must count an output overrun and emit
    m.put_samples(a, np.ones(W, np.float32), True)
    emitted = [m.poll() for _ in range(MIX_DIVISOR + 1)]
    assert any(e is not None for e in emitted)
    assert m.output_overrun_count == 1


def test_all_inputs_dead_disables_mixer():
    # reference: mixer_disable_input (mixer.cpp:96-112)
    m = Mixer("m", W)
    a = m.connect_input()
    b = m.connect_input()
    m.disable_input(a)
    assert m.enabled
    m.disable_input(b)
    assert not m.enabled
    assert m.poll() is None


def test_no_signal_input_not_mixed():
    m = Mixer("m", W)
    a = m.connect_input()
    b = m.connect_input()
    m.put_samples(a, np.full(W, 0.3, np.float32), True)
    m.put_samples(b, np.full(W, 9.9, np.float32), False)  # squelch closed
    out = m.poll()
    np.testing.assert_allclose(out, 0.3, rtol=1e-6)
