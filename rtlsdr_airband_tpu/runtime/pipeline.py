"""Streaming block pipeline: raw IQ in → per-channel audio blocks out.

Replaces the reference's demodulate() thread + ring-buffer protocol
(reference: src/rtl_airband.cpp:286-672) with a stateless-jitted block
function ``(raw_block, bins, params, state) -> (state', outputs)`` plus a
host-side framer that carries stream alignment between blocks.

Block structure (all sizes static per pipeline):
 - one block emits WAVE_BATCH = wave_rate/8 audio samples per channel
   (reference: rtl_airband.h:73);
 - the channelizer consumes hop = round(sample_rate/wave_rate) input samples
   per audio sample with an fft_size-hop look-ahead halo
   (reference: rtl_airband.cpp:394);
 - a one-time priming step computes the first AGC_EXTRA channelizer outputs
   to seed the demod look-back delay lines (the reference fills buffer
   indices [0, AGC_EXTRA) before the loop reads j >= AGC_EXTRA).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AGC_EXTRA
from ..ops.channelizer import (
    block_input_len,
    channelize_fft,
    channelize_matmul,
    last_frame_spectrum_power,
    make_taps,
)
from ..ops.demod import ChannelParams, DemodState, _levels, demod_block
from ..ops.params import ChannelSpec, cost_group_permutation, init_demod_state, make_channel_params
from ..ops.window import blackman_harris_7
from ..refmodel.channel_ref import bin_for_freq


@partial(jax.jit, static_argnames=("hop", "fft_size", "n_frames", "use_fft"))
def channelize_block(x, bins, window, *, hop, fft_size, n_frames, use_fft=False):
    chan = channelize_fft if use_fft else channelize_matmul
    return chan(x, bins, window, hop=hop, fft_size=fft_size, n_frames=n_frames)


def default_demod_backend() -> str:
    """'pallas' on real TPU hardware, 'xla' elsewhere (CPU tests, dry runs)."""
    try:
        return "pallas" if jax.devices()[0].platform.startswith("tpu") else "xla"
    except Exception:
        return "xla"


@partial(jax.jit, static_argnames=("hop", "fft_size", "n_frames", "use_fft", "fm_quadri", "with_ctcss", "with_afc", "with_iq", "demod_backend"))
def pipeline_block(
    x: jax.Array,  # [L, 2] f32 IQ-pair baseband slice for this block
    bins: jax.Array,  # [C] int32 FFT bin per channel
    window: jax.Array,  # [N] f32
    params: ChannelParams,
    state: DemodState,
    *,
    hop: int,
    fft_size: int,
    n_frames: int,
    use_fft: bool = False,
    fm_quadri: bool = False,
    with_ctcss: bool = True,
    with_afc: bool = False,
    with_iq: bool = True,
    demod_backend: str = "auto",
    taps: tuple[jax.Array, jax.Array] | None = None,
    inv_perm: jax.Array | None = None,
):
    """Fused channelize + demod for one block (the whole device program).

    demod_backend: 'pallas' (Mosaic kernel, TPU only), 'xla' (lax.scan), or
    'auto' (pallas on TPU, xla elsewhere).  with_iq=False elides the
    per-sample IQ-tap output (no channel has rawfile/IQ outputs).
    taps: optional precomputed matched-filter taps (see channelize_matmul);
    ignored by the FFT path.
    inv_perm: optional [C] int32 — when channels were reordered by
    cost_group_permutation (so the Pallas kernel's per-tile CTCSS gate skips
    CTCSS-free tiles), this restores user channel order on every per-channel
    output before it crosses to host."""
    chan = channelize_fft if use_fft else channelize_matmul
    if use_fft:
        mags, iqs = chan(x, bins, window, hop=hop, fft_size=fft_size, n_frames=n_frames)
    else:
        mags, iqs = chan(x, bins, window, hop=hop, fft_size=fft_size, n_frames=n_frames, taps=taps)
    backend = default_demod_backend() if demod_backend == "auto" else demod_backend
    if backend == "pallas":
        from ..ops.demod_pallas import demod_block_pallas

        state, audio, iq_out, open_flags = demod_block_pallas(params, state, mags, iqs, fm_quadri=fm_quadri, with_ctcss=with_ctcss, with_iq=with_iq)
    else:
        state, audio, iq_out, open_flags = demod_block(params, state, mags, iqs, fm_quadri=fm_quadri, with_ctcss=with_ctcss)
    # Per-channel observability snapshots, derived from the end-of-block
    # state exactly as the reference's stats/TUI read the live Squelch
    # (reference: output.cpp:598-869, rtl_airband.cpp:632-643):
    #  - squelch_level: Squelch::squelch_level() (squelch.cpp:164-177)
    #  - sig_outside: Squelch::signal_outside_filter() (squelch.cpp:152-154)
    #    = using_post_filter && has_pre_filter_signal && !has_post_filter_signal
    squelch_level = _levels(params, state.noise_floor, state.recent_open_count)
    sig_outside = state.using_post_filter & (state.pre_capped >= squelch_level) & (state.post_capped < state.sq_buffer[0])
    perm = (lambda a: a[inv_perm]) if inv_perm is not None else (lambda a: a)
    if inv_perm is not None:
        audio = audio[:, inv_perm]
        open_flags = open_flags[:, inv_perm]
        iq_out = iq_out[:, inv_perm] if with_iq else iq_out
    out = dict(
        audio=audio,  # [W, C]
        iq_out=iq_out,  # [W, C, 2] f32 IQ pairs
        open_flags=open_flags,  # [W, C] bool
        active=jnp.any(open_flags, axis=0),  # [C]
        signal_level=perm(state.pre_full),
        noise_level=perm(state.noise_floor),
        squelch_level=perm(squelch_level),
        sig_outside=perm(sig_outside),
        open_count=perm(state.open_count),
        flappy_count=perm(state.flappy_count),
        ctcss_found=perm(state.slow.found),
        ctcss_not_found=perm(state.slow.not_found),
    )
    if with_afc:
        out["spectrum_power"] = last_frame_spectrum_power(x, window, hop=hop, fft_size=fft_size, n_frames=n_frames)
    return state, out


@dataclass
class PipelineConfig:
    sample_rate: int = 2_560_000
    center_freq: int = 120_000_000
    fft_size: int = 512
    wave_rate: int = 8000
    sample_format: str = "f32c"  # 'u8' | 's8' | 's16' | 'f32' | 'f32c' (complex64 in)
    fullscale: float = 1.0
    channelizer: str = "matmul"  # 'matmul' | 'fft'
    fm_quadri: bool = False

    @property
    def hop(self) -> int:
        return int(round(self.sample_rate / self.wave_rate))

    @property
    def wave_batch(self) -> int:
        return self.wave_rate // 8


class Pipeline:
    """One device's streaming channelizer + demod pipeline."""

    def __init__(self, cfg: PipelineConfig, specs: list[ChannelSpec]):
        self.cfg = cfg
        self.specs = specs
        self.C = len(specs)
        self.W = cfg.wave_batch
        self.A = AGC_EXTRA
        self.hop = cfg.hop
        self.N = cfg.fft_size
        self.window = jnp.asarray(blackman_harris_7(self.N))
        # cost-class grouping: device slot j processes user channel
        # _order[j], so the Pallas kernel's per-tile event gates (CTCSS
        # Goertzel bank) fire on as few tiles as possible; all per-channel
        # outputs are restored to user order in-jit via _inv_perm.
        self._order = cost_group_permutation(specs)
        self._unperm = np.argsort(self._order).astype(np.int32)
        self._inv_perm = None if np.array_equal(self._order, np.arange(self.C, dtype=np.int32)) else jnp.asarray(self._unperm)
        self.params = make_channel_params(
            [specs[i] for i in self._order],
            wave_rate=cfg.wave_rate, sample_rate=cfg.sample_rate, center_freq=cfg.center_freq, fft_size=cfg.fft_size,
        )
        # FFT bin per channel in USER order (reference: config.cpp:661-664);
        # mutable for AFC/scan.  self.bins is the device-order copy.
        self.base_bins = np.array(
            [bin_for_freq(s.frequency, cfg.center_freq, cfg.sample_rate, cfg.fft_size) for s in specs], np.int32
        )
        self.user_bins = np.array(self.base_bins)
        self.bins = jnp.asarray(self.base_bins[self._order])
        self._taps = jax.jit(make_taps)(self.bins, self.window)
        self.any_ctcss = bool(any(s.ctcss > 0 for s in specs))
        self.any_afc = bool(any(s.afc for s in specs))
        self.any_iq = bool(any(s.has_iq_outputs for s in specs))

        self._pending = np.zeros((0, 2), np.float32)
        self._primed = False
        self.state: DemodState | None = None
        self.blocks_processed = 0

        self._prime_len = (self.A - 1) * self.hop + self.N
        self._block_need = self.W * self.hop  # new samples consumed per block
        self._block_len = block_input_len(self.W, self.hop, self.N)

    # ----------------------------------------------------------------- host

    def _decode(self, raw) -> np.ndarray:
        """Decode to [L, 2] float32 IQ pairs (complex64 never crosses the
        host<->device boundary — unsupported by the axon TPU runtime)."""
        if self.cfg.sample_format == "f32c" or (isinstance(raw, np.ndarray) and np.iscomplexobj(raw)):
            z = np.asarray(raw, np.complex64)
            return np.stack([z.real, z.imag], axis=-1).astype(np.float32)
        if isinstance(raw, np.ndarray) and raw.ndim == 2 and raw.shape[1] == 2 and raw.dtype == np.float32:
            return raw
        try:
            from ..native import convert_iq, native_available

            if native_available():
                return convert_iq(raw, self.cfg.sample_format, self.cfg.fullscale)
        except Exception:
            pass
        from ..ops.sampleconv import SampleFormat, decode_iq

        return decode_iq(raw, SampleFormat(self.cfg.sample_format), self.cfg.fullscale)

    def feed(self, raw) -> Iterator[dict]:
        """Feed IQ (complex64 array, [L, 2] f32 pairs, or raw bytes in the
        configured sample format).  Yields one result dict per completed
        block."""
        x = self._decode(raw)
        self._pending = np.concatenate([self._pending, x], axis=0) if self._pending.size else x

        if not self._primed:
            if self._pending.shape[0] < self._prime_len:
                return
            mags, iqs = channelize_block(
                jnp.asarray(self._pending[: self._prime_len]), self.bins, self.window,
                hop=self.hop, fft_size=self.N, n_frames=self.A, use_fft=self.cfg.channelizer == "fft",
            )
            self.state = init_demod_state(self.C, mags, iqs)
            self._pending = self._pending[self.A * self.hop :]
            self._primed = True

        while self._pending.shape[0] >= self._block_len:
            xb = jnp.asarray(self._pending[: self._block_len])
            self.state, out = pipeline_block(
                xb, self.bins, self.window, self.params, self.state,
                hop=self.hop, fft_size=self.N, n_frames=self.W,
                use_fft=self.cfg.channelizer == "fft", fm_quadri=self.cfg.fm_quadri,
                with_ctcss=self.any_ctcss, with_afc=self.any_afc, with_iq=self.any_iq,
                taps=self._taps, inv_perm=self._inv_perm,
            )
            self._pending = self._pending[self._block_need :]
            self.blocks_processed += 1
            yield out

    # -------------------------------------------------------- checkpointing

    def save_state(self, path: str) -> None:
        """Checkpoint the carried DSP state (squelch/AGC/filter/Goertzel
        recurrences + stream alignment) so a restarted process can resume
        demodulation gaplessly.  The reference has no DSP checkpointing —
        its recovery is reconnect/drop-audio (SURVEY.md §5)."""
        import numpy as np

        if self.state is None:
            raise RuntimeError("pipeline not primed; nothing to checkpoint")
        flat = {}
        for name in self.state._fields:
            leaf = getattr(self.state, name)
            if hasattr(leaf, "_fields"):  # nested CtcssState
                for sub in leaf._fields:
                    flat[f"state.{name}.{sub}"] = np.asarray(getattr(leaf, sub))
            else:
                flat[f"state.{name}"] = np.asarray(leaf)
        flat["pending"] = self._pending
        flat["bins"] = np.asarray(self.bins)
        flat["blocks_processed"] = np.int64(self.blocks_processed)
        np.savez(path, **flat)

    def load_state(self, path: str) -> None:
        """Resume from :meth:`save_state` (same channel config/shapes)."""
        import numpy as np

        from ..ops.demod import CtcssState, DemodState

        d = np.load(path)

        def ct(bank):
            return CtcssState(**{name: jnp.asarray(d[f"state.{bank}.{name}"]) for name in CtcssState._fields})

        kwargs = {}
        for name in DemodState._fields:
            if name in ("fast", "slow"):
                kwargs[name] = ct(name)
            else:
                kwargs[name] = jnp.asarray(d[f"state.{name}"])
        self.state = DemodState(**kwargs)
        self._pending = np.asarray(d["pending"])
        dev_bins = np.asarray(d["bins"], np.int32)  # saved in device order
        self.bins = jnp.asarray(dev_bins)
        self.user_bins = dev_bins[self._unperm]
        self._taps = jax.jit(make_taps)(self.bins, self.window)
        self.blocks_processed = int(d["blocks_processed"])
        self._primed = True

    # ------------------------------------------------------------ mutation

    def set_bins(self, bins) -> None:
        """AFC / scan retune: move channels to new FFT bins (USER channel
        order).  The DFT taps are re-derived by one tiny jitted call (bins
        change at 200 ms/2 s control cadence, not per block)."""
        self.user_bins = np.asarray(bins, np.int32).copy()
        self.bins = jnp.asarray(self.user_bins[self._order])
        self._taps = jax.jit(make_taps)(self.bins, self.window)

    def retune(self, specs: list[ChannelSpec], center_freq: int | None = None) -> None:
        """Scan-mode retune: new channel frequencies and/or device center.
        Rebuilds params + bins host-side; shapes are unchanged so the jitted
        block function is a cache hit (reference analog: controller_thread
        changing freq_idx + input centerfreq, rtl_airband.cpp:112-123)."""
        if center_freq is not None:
            self.cfg.center_freq = center_freq
        if len(specs) != self.C:
            raise ValueError("retune cannot change channel count")
        self.specs = specs
        self.any_iq = bool(any(s.has_iq_outputs for s in specs))
        cfg = self.cfg
        # feature set may change with the new freq entries -> regroup (safe:
        # the carried state is dropped and re-primed below)
        self._order = cost_group_permutation(specs)
        self._unperm = np.argsort(self._order).astype(np.int32)
        self._inv_perm = None if np.array_equal(self._order, np.arange(self.C, dtype=np.int32)) else jnp.asarray(self._unperm)
        self.params = make_channel_params(
            [specs[i] for i in self._order],
            wave_rate=cfg.wave_rate, sample_rate=cfg.sample_rate, center_freq=cfg.center_freq, fft_size=cfg.fft_size,
        )
        self.base_bins = np.array(
            [bin_for_freq(s.frequency, cfg.center_freq, cfg.sample_rate, cfg.fft_size) for s in specs], np.int32
        )
        self.user_bins = np.array(self.base_bins)
        self.bins = jnp.asarray(self.base_bins[self._order])
        self._taps = jax.jit(make_taps)(self.bins, self.window)
        # drop buffered samples from the old tuning and re-prime
        self._pending = np.zeros((0, 2), np.float32)
        self._primed = False
