"""Flagship model: a fully loaded multi-channel airband pipeline.

Used by __graft_entry__ (compile check + multi-chip dry run) and bench.py.
Mixed AM/NFM channel population with CTCSS, lowpass, notch — the maximal
configuration surface of the framework in one block step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AGC_EXTRA
from ..ops.params import ChannelSpec, cost_group_permutation, init_demod_state, make_channel_params
from ..ops.window import blackman_harris_7
from ..refmodel.channel_ref import bin_for_freq
from ..utils.siggen import am_carrier_iq, complex_noise, nfm_carrier_iq


def flagship_specs(n_channels: int, center_freq: int = 120_000_000, sample_rate: int = 2_560_000) -> list[ChannelSpec]:
    """Mixed channel population spread across the usable band."""
    specs = []
    span = int(sample_rate * 0.8)
    for i in range(n_channels):
        freq = center_freq - span // 2 + (i + 1) * span // (n_channels + 1)
        kind = i % 4
        if kind == 0:
            specs.append(ChannelSpec(frequency=freq, modulation="am"))
        elif kind == 1:
            specs.append(ChannelSpec(frequency=freq, modulation="am", bandwidth=6000, notch=1000.0))
        elif kind == 2:
            specs.append(ChannelSpec(frequency=freq, modulation="nfm", bandwidth=8000))
        else:
            specs.append(ChannelSpec(frequency=freq, modulation="nfm", ctcss=100.0))
    return specs


def build_flagship(n_channels: int = 64, *, wave_batch: int | None = None, sample_rate: int = 2_560_000, fft_size: int = 512, wave_rate: int = 16000, seed: int = 0):
    """Returns (block_kwargs, example_args) for pipeline_block:
    example_args = (x, bins, window, params, state)."""
    center = 120_000_000
    specs = flagship_specs(n_channels, center, sample_rate)
    # production layout: channels grouped by cost class (Pipeline does the
    # same), with the user-order restore gather included for honest timing
    order = cost_group_permutation(specs)
    specs = [specs[i] for i in order]
    unperm = np.argsort(order).astype(np.int32)
    inv_perm = None if np.array_equal(order, np.arange(len(specs), dtype=np.int32)) else jnp.asarray(unperm)
    hop = int(round(sample_rate / wave_rate))
    W = wave_batch if wave_batch is not None else wave_rate // 8
    A = AGC_EXTRA
    C = len(specs)

    params = make_channel_params(specs, wave_rate=wave_rate, sample_rate=sample_rate, center_freq=center, fft_size=fft_size)
    bins = jnp.asarray(np.array([bin_for_freq(s.frequency, center, sample_rate, fft_size) for s in specs], np.int32))
    window = jnp.asarray(blackman_harris_7(fft_size))

    # synthetic priming state + input block
    rng = np.random.default_rng(seed)
    prime_mags = jnp.asarray(np.abs(rng.normal(0, 1.0, (A, C))).astype(np.float32))
    prime_iqs = jnp.asarray(rng.normal(0, 0.5, (A, C, 2)).astype(np.float32))
    state = init_demod_state(C, prime_mags, prime_iqs)

    L = (W - 1) * hop + fft_size
    z = am_carrier_iq(sample_rate, 400_000, L, carrier_ampl=0.4) + complex_noise(L, 0.02, seed)
    x = jnp.asarray(np.stack([z.real, z.imag], axis=-1).astype(np.float32))

    block_kwargs = dict(hop=hop, fft_size=fft_size, n_frames=W, use_fft=False, fm_quadri=False, with_ctcss=True, with_afc=False, with_iq=False, inv_perm=inv_perm)
    return block_kwargs, (x, bins, window, params, state)


def build_flagship_stream(
    n_channels: int = 16,
    *,
    n_blocks: int = 12,
    wave_batch: int = 128,
    sample_rate: int = 2_560_000,
    fft_size: int = 512,
    wave_rate: int = 16000,
    seed: int = 0,
    gate: tuple[float, float] = (0.0, 0.62),
):
    """Multi-block ACTIVE scene for the sharding tests and the multi-chip
    dry run: strong carriers sit exactly ON three channels of different cost
    classes (plain AM, NFM+CTCSS, filtered AM+notch) spread across the
    channel range so they land in different 'chan' mesh shards; the AM
    carriers switch on/off at ``gate`` fractions of the stream so the squelch
    FSM both OPENS and CLOSES mid-stream (exercising the masked state-update
    paths across the all-to-all reshard); the NFM carrier stays keyed with a
    100 Hz CTCSS tone so the Goertzel banks accumulate across blocks.

    The noise floor is pre-seeded to its converged quiet value (what ~0.25 s
    of closed-squelch noise would produce via the reference's 1/16-sample EMA,
    squelch.cpp:196-246) so the scene needs tens, not thousands, of frames.

    Returns ``(block_kwargs, bins, window, params, state, x_blocks, hot)``:
    x_blocks is a list of ``n_blocks`` [L, 2] f32 inputs (phase-continuous
    slices of one stream) and ``hot`` the device-order indices of the three
    carrier channels.
    """
    center = 120_000_000
    user_specs = flagship_specs(n_channels, center, sample_rate)
    assert n_channels >= 4, "need all four cost classes"
    i_am = 0  # kind 0: plain AM
    i_ct = min(i for i in range(n_channels) if i % 4 == 3)  # NFM + CTCSS
    i_filt = max(i for i in range(n_channels) if i % 4 == 1)  # AM + bw/notch
    hot_user = [i_am, i_ct, i_filt]

    order = cost_group_permutation(user_specs)
    specs = [user_specs[i] for i in order]
    inv = np.argsort(order)
    hot = sorted(int(inv[i]) for i in hot_user)

    hop = int(round(sample_rate / wave_rate))
    W, A, C, N = wave_batch, AGC_EXTRA, n_channels, fft_size
    params = make_channel_params(specs, wave_rate=wave_rate, sample_rate=sample_rate, center_freq=center, fft_size=N)
    bins = jnp.asarray(np.array([bin_for_freq(s.frequency, center, sample_rate, N) for s in specs], np.int32))
    window = jnp.asarray(blackman_harris_7(N))

    # one continuous stream: quiet priming prefix, then n_blocks of carriers
    prime_consumed = A * hop
    body = n_blocks * W * hop
    total = prime_consumed + (body - hop) + N
    z = complex_noise(total, 0.004, seed)

    secs = total / sample_rate
    t_a = np.arange(int(wave_rate * secs) + 2, dtype=np.float64) / wave_rate
    g0 = prime_consumed + int(body * gate[0])
    g1 = prime_consumed + int(body * gate[1])
    on = np.zeros(total, np.float32)
    on[g0:g1] = 1.0

    audio_am = (0.8 * np.sin(2 * np.pi * 800.0 * t_a)).astype(np.float32)
    z += on * am_carrier_iq(sample_rate, user_specs[i_am].frequency - center, total, audio=audio_am, carrier_ampl=0.45, audio_rate=wave_rate)
    audio_f = (0.8 * np.sin(2 * np.pi * 400.0 * t_a)).astype(np.float32)
    z += on * am_carrier_iq(sample_rate, user_specs[i_filt].frequency - center, total, audio=audio_f, carrier_ampl=0.45, audio_rate=wave_rate)
    # NFM keyed for the whole block region (CTCSS accumulates continuously)
    keyed = np.zeros(total, np.float32)
    keyed[prime_consumed:] = 1.0
    audio_n = (0.55 * np.sin(2 * np.pi * 600.0 * t_a) + 0.3 * np.sin(2 * np.pi * 100.0 * t_a)).astype(np.float32)
    z += keyed * nfm_carrier_iq(sample_rate, user_specs[i_ct].frequency - center, total, audio=audio_n, deviation_hz=2500.0, carrier_ampl=0.4, audio_rate=wave_rate)

    x_all = np.stack([z.real, z.imag], axis=-1).astype(np.float32)

    # prime exactly like Pipeline: channelize the first AGC_EXTRA frames
    from ..ops.channelizer import channelize_matmul

    prime_len = (A - 1) * hop + N
    mags, iqs = jax.jit(partial(channelize_matmul, hop=hop, fft_size=N, n_frames=A))(
        jnp.asarray(x_all[:prime_len]), bins, window
    )
    state = init_demod_state(C, mags, iqs)
    # pre-seed the converged quiet floor (see docstring)
    floor = np.median(np.asarray(mags), axis=0).astype(np.float32) + np.float32(1e-4)
    state = state._replace(noise_floor=jnp.asarray(floor))

    blen = (W - 1) * hop + N
    x_blocks = [jnp.asarray(x_all[prime_consumed + k * W * hop : prime_consumed + k * W * hop + blen]) for k in range(n_blocks)]
    block_kwargs = dict(hop=hop, fft_size=N, n_frames=W, use_fft=False, fm_quadri=False, with_ctcss=True, with_afc=False, with_iq=False, inv_perm=None)
    return block_kwargs, bins, window, params, state, x_blocks, hot
