"""Parity: the Pallas demod kernel vs the XLA lax.scan reference.

Runs in Pallas interpreter mode on the CPU test mesh (the same kernel runs
compiled on TPU; scripts/verify_pallas_tpu.py checks compiled parity and
bench.py exercises it for perf).  Audio must match to float32 noise, squelch
decisions and integer state exactly, across block boundaries, including
channel counts that don't divide the 1024-channel tile.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rtlsdr_airband_tpu.constants import AGC_EXTRA
from rtlsdr_airband_tpu.ops.demod import demod_block
from rtlsdr_airband_tpu.ops.demod_pallas import demod_block_pallas
from rtlsdr_airband_tpu.ops.params import ChannelSpec, init_demod_state, make_channel_params

FS, N, CENTER = 2_560_000, 512, 120_000_000

SPECS = [
    ChannelSpec(frequency=120_400_000, modulation="am"),
    ChannelSpec(frequency=120_500_000, modulation="am", bandwidth=6000, notch=1000.0, has_iq_outputs=True),
    ChannelSpec(frequency=120_600_000, modulation="nfm", bandwidth=8000),
    ChannelSpec(frequency=120_700_000, modulation="nfm", ctcss=100.0),
    ChannelSpec(frequency=120_800_000, modulation="am", squelch_threshold_dbfs=-40.0),
    ChannelSpec(frequency=120_900_000, modulation="am", ampfactor=1.3),
]


def _tree_assert_close(st_x, st_p, atol):
    for name in st_x._fields:
        lx, lp = getattr(st_x, name), getattr(st_p, name)
        pairs = (
            [(f"{name}.{nn}", getattr(lx, nn), getattr(lp, nn)) for nn in lx._fields]
            if hasattr(lx, "_fields")
            else [(name, lx, lp)]
        )
        for label, vx, vp in pairs:
            vx, vp = np.asarray(vx), np.asarray(vp)
            if vx.dtype.kind in "ib":
                assert np.array_equal(vx, vp), f"state {label} int/bool mismatch"
            else:
                d = np.abs(vx.astype(np.float64) - vp.astype(np.float64)).max()
                assert d <= atol, f"state {label}: maxdiff {d:.3e}"


def test_transition_specializations():
    """The kernel inlines set_state(upd) with the validity table collapsed
    under each call-site's constant upd; prove the collapsed forms equal the
    general table (reference: squelch.cpp:297-361) for every current state."""
    import jax.numpy as jnp

    from rtlsdr_airband_tpu.ops.demod import CLOSED, CLOSING, LSA, OPEN, OPENING, _set_state_valid

    cur = jnp.arange(5)
    spec = {
        CLOSING: jnp.where((cur == CLOSED) | (cur == LSA), CLOSED, CLOSING),
        OPENING: jnp.where(cur == LSA, CLOSED, jnp.where(cur == OPEN, OPEN, OPENING)),
        LSA: jnp.where((cur == CLOSED) | (cur == OPENING), CLOSED, LSA),
        CLOSED: jnp.where(cur == OPEN, CLOSING, CLOSED),
    }
    for upd, got in spec.items():
        assert np.array_equal(np.asarray(_set_state_valid(cur, upd)), np.asarray(got)), upd
    # and the call-site masks collapse further: cur==OPEN -> CLOSING is
    # CLOSING; cur==CLOSED -> OPENING is OPENING; active (not CLOSED/LSA)
    # -> LSA is LSA except OPENING->CLOSED
    assert int(_set_state_valid(jnp.array([OPEN]), CLOSING)[0]) == CLOSING
    assert int(_set_state_valid(jnp.array([CLOSED]), OPENING)[0]) == OPENING
    for c in (OPENING, CLOSING, OPEN):
        want = CLOSED if c == OPENING else LSA
        assert int(_set_state_valid(jnp.array([c]), LSA)[0]) == want


@pytest.mark.parametrize("with_ctcss", [True, False])
def test_pallas_matches_xla_scan(with_ctcss):
    specs = SPECS
    C = len(specs)
    wr, W, A = 8000, 200, AGC_EXTRA
    params = make_channel_params(specs, wave_rate=wr, sample_rate=FS, center_freq=CENTER, fft_size=N)
    rng = np.random.default_rng(0)
    state = init_demod_state(
        C,
        jnp.asarray(np.abs(rng.normal(0, 1.0, (A, C))).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.5, (A, C, 2)).astype(np.float32)),
    )
    st_x = st_p = state
    for blk in range(3):
        # strong signal on block 0 (forces opens/boots), weak after (closes/fades)
        mags = jnp.asarray(np.abs(rng.normal(0, 1.0, (W, C)) + (3.0 if blk == 0 else 0.0)).astype(np.float32))
        iqs = jnp.asarray(rng.normal(0, 0.5, (W, C, 2)).astype(np.float32))
        st_x, a_x, iq_x, o_x = demod_block(params, st_x, mags, iqs, with_ctcss=with_ctcss)
        st_p, a_p, iq_p, o_p = demod_block_pallas(params, st_p, mags, iqs, with_ctcss=with_ctcss, interpret=True)
        assert np.abs(np.asarray(a_x) - np.asarray(a_p)).max() < 1e-4
        assert np.abs(np.asarray(iq_x) - np.asarray(iq_p)).max() < 1e-4
        assert np.array_equal(np.asarray(o_x), np.asarray(o_p))
    _tree_assert_close(st_x, st_p, 1e-4)


def test_pallas_nondivisible_channel_count():
    # C=3 exercises the pad-to-1024 path end to end
    specs = SPECS[:3]
    C = len(specs)
    wr, W, A = 8000, 120, AGC_EXTRA
    params = make_channel_params(specs, wave_rate=wr, sample_rate=FS, center_freq=CENTER, fft_size=N)
    rng = np.random.default_rng(1)
    state = init_demod_state(
        C,
        jnp.asarray(np.abs(rng.normal(0, 1.0, (A, C))).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.5, (A, C, 2)).astype(np.float32)),
    )
    mags = jnp.asarray(np.abs(rng.normal(0, 1.0, (W, C)) + 2.0).astype(np.float32))
    iqs = jnp.asarray(rng.normal(0, 0.5, (W, C, 2)).astype(np.float32))
    st_x, a_x, _, o_x = demod_block(params, state, mags, iqs)
    st_p, a_p, _, o_p = demod_block_pallas(params, state, mags, iqs, interpret=True)
    assert a_p.shape == (W, C)
    assert np.abs(np.asarray(a_x) - np.asarray(a_p)).max() < 1e-4
    assert np.array_equal(np.asarray(o_x), np.asarray(o_p))
    _tree_assert_close(st_x, st_p, 1e-4)


def test_pair_parity_bit_identical(monkeypatch):
    """Two-tile co-scheduling (pair=True — the round-5 latency-floor
    experiment) is pure schedule/grid restructuring over disjoint slices:
    audio, flags and ALL state must be bit-identical to pair=False."""
    monkeypatch.setenv("RTLSDR_DEMOD_SUBL", "8")  # tile = 1024 -> G=2 at C=2048
    C, W, A = 2048, 64, AGC_EXTRA
    specs = [
        ChannelSpec(
            frequency=CENTER + 1000 * (i - C // 2),
            modulation="nfm" if i % 3 == 0 else "am",
            ctcss=100.0 if i % 7 == 0 else 0.0,
            bandwidth=6000.0 if i % 5 == 0 else 0.0,
            notch=1000.0 if i % 11 == 0 else 0.0,
        )
        for i in range(C)
    ]
    params = make_channel_params(specs, wave_rate=8000, sample_rate=FS, center_freq=CENTER, fft_size=N)
    rng = np.random.default_rng(7)
    state = init_demod_state(
        C,
        jnp.asarray(np.abs(rng.normal(0, 1.0, (A, C))).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.5, (A, C, 2)).astype(np.float32)),
    )
    mags = jnp.asarray(np.abs(rng.normal(0, 1.0, (W, C)) + 2.0).astype(np.float32))
    iqs = jnp.asarray(rng.normal(0, 0.5, (W, C, 2)).astype(np.float32))
    st_a, a_a, iq_a, o_a = demod_block_pallas(params, state, mags, iqs, interpret=True, pair=False)
    st_b, a_b, iq_b, o_b = demod_block_pallas(params, state, mags, iqs, interpret=True, pair=True)
    np.testing.assert_array_equal(np.asarray(a_a), np.asarray(a_b))
    np.testing.assert_array_equal(np.asarray(iq_a), np.asarray(iq_b))
    np.testing.assert_array_equal(np.asarray(o_a), np.asarray(o_b))
    _tree_assert_close(st_a, st_b, 0.0)


def test_unroll_parity_bit_identical():
    """Manual sample-loop unrolling (latency-floor experiment) is pure loop
    restructuring: unroll in {1, 2, 4} must produce bit-identical audio,
    flags and state."""
    import numpy as np
    import jax.numpy as jnp

    from rtlsdr_airband_tpu.models.flagship import build_flagship
    from rtlsdr_airband_tpu.ops.demod_pallas import demod_block_pallas

    bk, (x, bins, window, params, state) = build_flagship(n_channels=16, wave_batch=128)
    rng = np.random.default_rng(0)
    W, C = 128, 16
    mags = jnp.asarray(rng.random((W, C), np.float32) * 0.1)
    iqs = jnp.asarray(rng.random((W, C, 2), np.float32) * 0.1)
    outs = {}
    for u in (1, 2, 4):
        st, audio, _iq, fl = demod_block_pallas(
            params, state, mags, iqs,
            fm_quadri=bk["fm_quadri"], with_ctcss=bk["with_ctcss"], interpret=True, unroll=u,
        )
        outs[u] = (np.asarray(audio), np.asarray(fl), np.asarray(st.cur), np.asarray(st.noise_floor), np.asarray(st.fast.count))
    for u in (2, 4):
        for a, b in zip(outs[1], outs[u]):
            np.testing.assert_array_equal(a, b, err_msg=f"unroll {u}")
