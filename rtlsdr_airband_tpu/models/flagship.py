"""Flagship model: a fully loaded multi-channel airband pipeline.

Used by __graft_entry__ (compile check + multi-chip dry run) and bench.py.
Mixed AM/NFM channel population with CTCSS, lowpass, notch — the maximal
configuration surface of the framework in one block step.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import AGC_EXTRA
from ..ops.params import ChannelSpec, cost_group_permutation, init_demod_state, make_channel_params
from ..ops.window import blackman_harris_7
from ..refmodel.channel_ref import bin_for_freq
from ..utils.siggen import am_carrier_iq, complex_noise


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
