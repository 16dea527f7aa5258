"""Fuzz parity: random channel configurations and signal statistics through
both demod backends (Pallas interpreter vs XLA scan), asserting identical
squelch decisions and integer state.  Catches branch/gating bugs the curated
cases in test_demod_pallas.py might miss (LSA aborts, flap detection,
post-filter closes, mid-block opens)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtlsdr_airband_tpu.constants import AGC_EXTRA
from rtlsdr_airband_tpu.ops.demod import demod_block
from rtlsdr_airband_tpu.ops.demod_pallas import demod_block_pallas
from rtlsdr_airband_tpu.ops.goertzel import STANDARD_TONES
from rtlsdr_airband_tpu.ops.params import ChannelSpec, init_demod_state, make_channel_params

FS, N, CENTER = 2_560_000, 512, 120_000_000


def random_specs(rng, n):
    specs = []
    for i in range(n):
        mod = rng.choice(["am", "nfm"])
        specs.append(ChannelSpec(
            frequency=int(119e6 + rng.integers(0, 2_000_000)),
            modulation=str(mod),
            ampfactor=float(rng.uniform(0.5, 1.5)),
            bandwidth=float(rng.choice([0.0, 4000.0, 8000.0])),
            notch=float(rng.choice([0.0, 0.0, 1200.0])),
            ctcss=float(rng.choice([0.0, 0.0, rng.choice(STANDARD_TONES)])),
            squelch_threshold_dbfs=(float(rng.uniform(-50, -20)) if rng.random() < 0.3 else None),
            squelch_snr_threshold_db=(float(rng.uniform(5, 15)) if rng.random() < 0.3 else None),
            has_iq_outputs=bool(rng.random() < 0.2),
        ))
    return specs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_parity(seed):
    rng = np.random.default_rng(seed)
    C = int(rng.integers(2, 7))
    wr = int(rng.choice([8000, 16000]))
    W = 150
    specs = random_specs(rng, C)
    params = make_channel_params(specs, wave_rate=wr, sample_rate=FS, center_freq=CENTER, fft_size=N)
    state = init_demod_state(
        C,
        jnp.asarray(np.abs(rng.normal(0, 1.0, (AGC_EXTRA, C))).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.5, (AGC_EXTRA, C, 2)).astype(np.float32)),
    )
    st_x = st_p = state
    for blk in range(4):
        # alternate bursty / quiet / flappy statistics to hit many FSM paths
        base = [3.0, 0.0, 2.0, 0.05][blk]
        mags = np.abs(rng.normal(0, 1.0, (W, C)) + base).astype(np.float32)
        if blk == 2:  # flappy: drop the signal in short gaps
            mags[::13] *= 0.05
        mags_j = jnp.asarray(mags)
        iqs = jnp.asarray(rng.normal(0, 0.5, (W, C, 2)).astype(np.float32))
        st_x, a_x, iq_x, o_x = demod_block(params, st_x, mags_j, iqs)
        st_p, a_p, iq_p, o_p = demod_block_pallas(params, st_p, mags_j, iqs, interpret=True)
        assert np.array_equal(np.asarray(o_x), np.asarray(o_p)), f"open flags diverge (seed={seed}, blk={blk})"
        assert np.abs(np.asarray(a_x) - np.asarray(a_p)).max() < 2e-4
    for name in ("cur", "nxt", "delay", "low_signal_count", "open_count", "flappy_count",
                 "recent_open_count", "closed_sample_count", "sample_count", "dm_phi"):
        assert np.array_equal(np.asarray(getattr(st_x, name)), np.asarray(getattr(st_p, name))), name


@pytest.mark.parametrize("pop", ["all_plain_am", "all_nfm", "all_am_notch"])
def test_homogeneous_population_parity(pop):
    """Homogeneous channel populations are exactly where the kernel's
    per-tile cost-class gates (tile_am / tile_nfm / tile_notch, round 4)
    actually SKIP whole blocks — parity here proves the skipped paths'
    state really is untouched, not just masked."""
    rng = np.random.default_rng(7)
    C, W, wr = 5, 150, 16000
    if pop == "all_plain_am":
        specs = [ChannelSpec(frequency=int(119.5e6 + i * 3e5), modulation="am") for i in range(C)]
    elif pop == "all_nfm":
        specs = [ChannelSpec(frequency=int(119.5e6 + i * 3e5), modulation="nfm") for i in range(C)]
    else:
        specs = [ChannelSpec(frequency=int(119.5e6 + i * 3e5), modulation="am", bandwidth=6000.0, notch=1200.0) for i in range(C)]
    params = make_channel_params(specs, wave_rate=wr, sample_rate=FS, center_freq=CENTER, fft_size=N)
    state = init_demod_state(
        C,
        jnp.asarray(np.abs(rng.normal(0, 1.0, (AGC_EXTRA, C))).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.5, (AGC_EXTRA, C, 2)).astype(np.float32)),
    )
    st_x = st_p = state
    for blk in range(3):
        base = [3.0, 0.05, 2.5][blk]  # open, close, reopen
        mags = np.abs(rng.normal(0, 1.0, (W, C)) + base).astype(np.float32)
        mags_j = jnp.asarray(mags)
        iqs = jnp.asarray(rng.normal(0, 0.5, (W, C, 2)).astype(np.float32))
        st_x, a_x, _, o_x = demod_block(params, st_x, mags_j, iqs)
        st_p, a_p, _, o_p = demod_block_pallas(params, st_p, mags_j, iqs, interpret=True)
        assert np.array_equal(np.asarray(o_x), np.asarray(o_p)), (pop, blk)
        assert np.abs(np.asarray(a_x) - np.asarray(a_p)).max() < 2e-4, (pop, blk)
    for name in ("cur", "nxt", "delay", "low_signal_count", "open_count", "flappy_count",
                 "recent_open_count", "closed_sample_count", "sample_count", "dm_phi"):
        assert np.array_equal(np.asarray(getattr(st_x, name)), np.asarray(getattr(st_p, name))), (pop, name)
    # float state of the skipped paths must be untouched too
    for name in ("agc", "pr", "pj", "prev_waveout", "notch_x", "notch_y"):
        assert np.allclose(np.asarray(getattr(st_x, name)), np.asarray(getattr(st_p, name)), atol=2e-4), (pop, name)
