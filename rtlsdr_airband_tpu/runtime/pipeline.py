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
    decode_raw_iq,
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


def _state_meta(params: ChannelParams, state: DemodState):
    """(squelch_level, sig_outside) snapshots from a carried state (device
    channel order)."""
    squelch_level = _levels(params, state.noise_floor, state.recent_open_count)
    sig_outside = state.using_post_filter & (state.pre_capped >= squelch_level) & (state.post_capped < state.sq_buffer[0])
    return squelch_level, sig_outside


def default_demod_backend() -> str:
    """'pallas' on real TPU hardware, 'xla' elsewhere (CPU tests, dry runs)."""
    try:
        return "pallas" if jax.devices()[0].platform.startswith("tpu") else "xla"
    except Exception:
        return "xla"


def _pipeline_block_impl(
    x: jax.Array,  # [L, 2] f32 IQ-pair slice, or [2L] raw when sample_fmt is set
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
    sample_fmt: str = "pairs",
    fullscale: float = 1.0,
    taps: tuple[jax.Array, jax.Array] | None = None,
    inv_perm: jax.Array | None = None,
    mesh=None,
    pallas_interpret: bool = False,
):
    """Fused channelize + demod for one block (the whole device program).

    demod_backend: 'pallas' (Mosaic kernel, TPU only), 'xla' (lax.scan), or
    'auto' (pallas on TPU, xla elsewhere).  with_iq=False elides the
    per-sample IQ-tap output (no channel has rawfile/IQ outputs).
    sample_fmt: 'pairs' (x is [L, 2] f32) or 'u8'/'s8'/'s16' — raw interleaved
    IQ decoded ON DEVICE (reference LUT semantics, rtl_airband.cpp:316-324);
    shipping raw bytes quarters the host->device traffic on the tunnel.
    taps: optional precomputed matched-filter taps (see channelize_matmul);
    ignored by the FFT path.
    inv_perm: optional [C] int32 — when channels were reordered by
    cost_group_permutation (so the Pallas kernel's per-tile CTCSS gate skips
    CTCSS-free tiles), this restores user channel order on every per-channel
    output before it crosses to host.

    MESH MODE (``mesh`` is a jax.sharding.Mesh with ('time', 'chan') axes —
    the reference's only parallelism is pthreads in one process,
    SURVEY.md §2.5): ``x`` is a (body, tail) pair — body [n_frames*hop(·2
    when raw)] sharded over 'time', tail [fft_size-hop, 2] f32 pairs
    replicated.  The channelizer runs time-sharded under shard_map with
    ppermute halo exchange over ICI; the demod state recurrences are sharded
    over channels across EVERY device (both mesh axes) via one GSPMD
    all-to-all reshard.  demod_backend='pallas' launches the Mosaic kernel
    per channel shard under an explicit shard_map (pallas_interpret=True for
    CPU-mesh testing).  The channelizer is always the matmul kernel here
    (``use_fft`` is ignored: per-shard frame counts make the matched-filter
    matmul the right shape, and bins are sparse by construction)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import channel_pspec, channelize_time_sharded_parts, pick_channel_axes

        x_body, x_tail = x
        if sample_fmt != "pairs":
            x_body = decode_raw_iq(x_body, sample_fmt, fullscale)
        x_body = jax.lax.with_sharding_constraint(x_body, NamedSharding(mesh, P("time", None)))
        mags, iqs = channelize_time_sharded_parts(
            mesh, x_body, x_tail, bins, window, hop=hop, fft_size=fft_size, n_frames=n_frames, taps=taps
        )
        # reshard [time-sharded frames, C] -> [frames, all-device-sharded C]:
        # GSPMD lowers this to one all-to-all over ICI.  The demod stage is
        # per-channel recurrence with zero cross-channel communication, so
        # channels spread over BOTH axes when C divides the device count —
        # the time devices don't idle (small/indivisible C falls back, see
        # pick_channel_axes).
        call_axes = pick_channel_axes(mesh, mags.shape[-1])
        mags = jax.lax.with_sharding_constraint(mags, NamedSharding(mesh, P(None, call_axes)))
        iqs = jax.lax.with_sharding_constraint(iqs, NamedSharding(mesh, P(None, call_axes, None)))
        cdim = mags.shape[-1]
        state = jax.tree.map(
            lambda l: jax.lax.with_sharding_constraint(l, NamedSharding(mesh, channel_pspec(l.shape, cdim, call_axes))), state
        )
        backend = default_demod_backend() if demod_backend == "auto" else demod_backend
        if backend == "pallas":
            from ..ops.demod_pallas import demod_block_pallas
            from ..parallel.sharding import shard_map

            def local_demod(params, state, mags, iqs):
                return demod_block_pallas(
                    params, state, mags, iqs,
                    fm_quadri=fm_quadri, with_ctcss=with_ctcss, with_iq=with_iq, interpret=pallas_interpret,
                )

            pspec = jax.tree.map(lambda l: channel_pspec(l.shape, cdim, call_axes), params)
            sspec = jax.tree.map(lambda l: channel_pspec(l.shape, cdim, call_axes), state)
            state, audio, iq_out, open_flags = shard_map(
                local_demod,
                mesh=mesh,
                in_specs=(pspec, sspec, P(None, call_axes), P(None, call_axes, None)),
                out_specs=(sspec, P(None, call_axes), P(None, call_axes, None), P(None, call_axes)),
            )(params, state, mags, iqs)
        else:
            state, audio, iq_out, open_flags = demod_block(params, state, mags, iqs, fm_quadri=fm_quadri, with_ctcss=with_ctcss)
        x = jnp.concatenate([x_body, x_tail], axis=0) if with_afc else x_body
    else:
        if sample_fmt != "pairs":
            x = decode_raw_iq(x, sample_fmt, fullscale)
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
    squelch_level, sig_outside = _state_meta(params, state)
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


_PIPELINE_STATICS = ("hop", "fft_size", "n_frames", "use_fft", "fm_quadri", "with_ctcss", "with_afc", "with_iq", "demod_backend", "sample_fmt", "fullscale", "mesh", "pallas_interpret")

pipeline_block = partial(jax.jit, static_argnames=_PIPELINE_STATICS)(_pipeline_block_impl)


META_F = ("signal_level", "noise_level", "squelch_level")  # f32 [C] gauges
META_I = ("open_count", "flappy_count", "ctcss_found", "ctcss_not_found")  # i32 [C] counters


@partial(jax.jit, static_argnames=("k_blocks", "active_slots", "with_flags", "audio_fmt", "suppress_fade_tails", "meta_per_chunk") + _PIPELINE_STATICS)
def pipeline_chain(
    x: jax.Array,  # flat raw [(2·)L_total] or pairs [L_total, 2] covering k_blocks overlapping blocks
    bins: jax.Array,
    window: jax.Array,
    params: ChannelParams,
    state: DemodState,
    *,
    k_blocks: int,
    hop: int,
    fft_size: int,
    n_frames: int,
    use_fft: bool = False,
    fm_quadri: bool = False,
    with_ctcss: bool = True,
    with_afc: bool = False,
    with_iq: bool = True,
    demod_backend: str = "auto",
    sample_fmt: str = "pairs",
    fullscale: float = 1.0,
    taps: tuple[jax.Array, jax.Array] | None = None,
    inv_perm: jax.Array | None = None,
    active_slots: int = 0,
    with_flags: bool = False,
    mesh=None,
    pallas_interpret: bool = False,
    audio_fmt: str = "f32",
    suppress_fade_tails: bool = False,
    meta_per_chunk: bool = False,
):
    """Chain ``k_blocks`` streaming blocks in ONE dispatch (lax.scan threading
    the demod state), amortizing the per-call tunnel RTT — the production
    analog of bench.py's measurement protocol, and the TPU-native equivalent
    of the reference's thread-decoupled stages (rtl_airband.cpp:1093-1112).

    MESH MODE (``mesh`` set): ``x`` is a (bodies, tails) pair of stacked
    per-block inputs — bodies [K, n_frames*hop(·2 when raw)] with the
    per-block axis sharded over 'time', tails [K, fft_size-hop, 2] f32 pairs
    replicated (blocks overlap by the halo, so the stacked layout re-ships
    ~0.1% of the stream; in exchange every time shard's slice boundary is
    static).  Each scanned block runs the sharded step of
    ``_pipeline_block_impl``; per-channel meta/active outputs are replicated
    for host consumption while the dense audio stays channel-sharded (each
    host drains only its addressable channels — multihost.local_audio_shards).

    Per-channel scalar outputs are packed into two dense arrays (``meta_f``
    [K, 3, C] f32 and ``meta_i`` [K, 5, C] i32) so a chunk costs a handful of
    device->host fetches instead of ~12 per block.  ``Pipeline._to_host``
    unpacks them back into per-block dicts.

    ``active_slots`` = S > 0 enables the ACTIVE-CHANNEL GATHER: instead of the
    dense [W, C] audio (the device->host bandwidth wall at large C — the host
    only ever plays/encodes OPEN channels, like the reference's outputs which
    consume nothing while squelch is closed, output.cpp:598-660), each block
    ships audio for at most S open channels ([W, S]) plus their channel
    indices (``slot_channel`` [S] i32, -1 = empty) and the true open count
    (``n_active``, for overflow accounting).  Closed channels reconstruct as
    silence on host.  ``with_flags`` additionally ships the per-sample
    [W, C] open_flags (diagnostic only — nothing in the app consumes it).

    ``audio_fmt`` selects the audio wire format of the device->host fetch
    (the dominant transfer at production channel counts — CLAUDE.md: the
    axon tunnel runs ~27 MB/s D2H): 'f32' (dense float), 'i16' (linear
    int16, ~90 dB quantization SNR, half the bytes), or 'i8bf' (block-float:
    int8 mantissas + one f32 scale per channel-slot per block, ~49 dB SNR
    vs the block peak, quarter the bytes).  ``Pipeline._to_host`` restores
    float transparently by dtype, so sinks always see float32.

    ``suppress_fade_tails`` (active-gather mode only): channels whose block
    audio is ONLY the deterministic squelch-closed tail — the AM
    squelch-close 0.94^i fade-out (reference: rtl_airband.cpp:542-546) or
    the 0.5-initialized startup tail (config.cpp:315) — are not shipped at
    all; the host reconstructs the tail from the channel's last shipped
    sample (``Pipeline._to_host``).  NFM channels closed within the last
    ~AGC_EXTRA samples still ship one block (their tail is real delayed
    audio, not a synthesizable fade).  Frees gather slots and removes the
    block-0 whole-population startup flood from the slot competition.
    """
    need = block_input_len(n_frames, hop, fft_size)
    step = n_frames * hop

    def get_block(k):
        if sample_fmt == "pairs":
            return jax.lax.dynamic_slice(x, (k * step, 0), (need, 2))
        return jax.lax.dynamic_slice(x, (k * step * 2,), (need * 2,))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

    def body(st, xk):
        st_in = st  # entry state: fade-tail suppression reads pre-block FSM fields
        st, out = _pipeline_block_impl(
            xk if mesh is not None else get_block(xk), bins, window, params, st,
            hop=hop, fft_size=fft_size, n_frames=n_frames, use_fft=use_fft,
            fm_quadri=fm_quadri, with_ctcss=with_ctcss, with_afc=with_afc,
            with_iq=with_iq, demod_backend=demod_backend,
            sample_fmt=sample_fmt, fullscale=fullscale, taps=taps, inv_perm=inv_perm,
            mesh=mesh, pallas_interpret=pallas_interpret,
        )
        if mesh is not None:
            from ..parallel.sharding import pick_channel_axes

            # meta/active are small per-channel snapshots every host's stats
            # consume -> replicate; the dense [W, C] audio/iq stay sharded
            # over channels so each host only fetches what its sinks drain.
            repl = lambda a: jax.lax.with_sharding_constraint(a, NamedSharding(mesh, P()))
            for k_ in ("active", "signal_level", "noise_level", "squelch_level", "sig_outside",
                       "open_count", "flappy_count", "ctcss_found", "ctcss_not_found"):
                out[k_] = repl(out[k_])
            caxes = pick_channel_axes(mesh, out["audio"].shape[1])
            cspec = caxes if caxes else None
            out["audio"] = jax.lax.with_sharding_constraint(
                out["audio"], NamedSharding(mesh, P(None, cspec))
            )
            if with_iq:
                out["iq_out"] = jax.lax.with_sharding_constraint(
                    out["iq_out"], NamedSharding(mesh, P(None, cspec, None))
                )
        packed = dict(audio=out["audio"], active=out["active"])
        if not meta_per_chunk:
            packed["meta_f"] = jnp.stack([out[k_] for k_ in META_F])
            packed["meta_i"] = jnp.stack([out[k_].astype(jnp.int32) for k_ in META_I] + [out["sig_outside"].astype(jnp.int32)])
        if with_flags:
            packed["open_flags"] = out["open_flags"]
        if active_slots:
            slots = min(active_slots, out["audio"].shape[1])
            # gather channels with ANY nonzero audio, not just squelch-open
            # ones: the AM squelch-close fade tail (and the reference's 0.5
            # waveout init, config.cpp:315) emits audio on channels whose
            # squelch is already closed — keying on open flags alone would
            # truncate every transmission's fade-out.  Squelch-open channels
            # outrank fade-tail-only ones when slots are scarce (top_k is
            # stable: ties resolve to ascending channel index).
            nonzero = jnp.max(jnp.abs(out["audio"]), axis=0) > 0.0
            if suppress_fade_tails:
                # a closed channel's block audio lives ONLY in its first
                # AGC_EXTRA emitted samples (the carried waveout tail —
                # everything later is this block's scan output, which is 0
                # while closed).  It is host-synthesizable EXCEPT when the
                # tail holds real delayed audio: an NFM channel (no fade
                # rewrite) that closed within the last ~AGC_EXTRA samples.
                # closed_sample_count at block ENTRY measures exactly that;
                # open_count==0 excludes the never-opened startup tail
                # (pure 0.5 prefix — synthesized from the known init).
                csc, ocnt, nfm = st_in.closed_sample_count, st_in.open_count, params.is_nfm
                if inv_perm is not None:
                    csc, ocnt, nfm = csc[inv_perm], ocnt[inv_perm], nfm[inv_perm]
                must_ship = nfm & (ocnt > 0) & (csc < AGC_EXTRA + 2)
                nonzero = nonzero & (out["active"] | must_ship)
            score = out["active"].astype(jnp.int32) * 2 + nonzero.astype(jnp.int32)
            vals, idx = jax.lax.top_k(score, slots)
            valid = vals > 0
            idx = jnp.where(valid, idx, -1).astype(jnp.int32)
            g = jnp.maximum(idx, 0)
            packed["audio"] = jnp.where(valid[None, :], out["audio"][:, g], 0.0)
            packed["slot_channel"] = idx
            packed["n_active"] = jnp.sum(score > 0).astype(jnp.int32)
            if with_iq:
                packed["iq_out"] = jnp.where(valid[None, :, None], out["iq_out"][:, g], 0.0)
            if mesh is not None:
                # the gathered [W, S] slots are the whole point of the fetch
                # economy — replicate so every host can drain them directly
                # (XLA gathers the S open channels over ICI, not the tunnel)
                repl = lambda a: jax.lax.with_sharding_constraint(a, NamedSharding(mesh, P()))
                packed["audio"] = repl(packed["audio"])
                packed["slot_channel"] = repl(packed["slot_channel"])
                packed["n_active"] = repl(packed["n_active"])
                if with_iq:
                    packed["iq_out"] = repl(packed["iq_out"])
        elif with_iq:
            packed["iq_out"] = out["iq_out"]
        if audio_fmt == "i16":
            # ship audio as int16 (audio is already NaN-scrubbed and clamped
            # to +-1.0 per the reference's LAME requirement,
            # rtl_airband.cpp:594-604): halves the device->host bytes of the
            # dominant fetch at ~90 dB quantization SNR.  _to_host restores
            # float by dtype, so nothing downstream changes.
            packed["audio"] = jnp.clip(jnp.round(packed["audio"] * 32767.0), -32768.0, 32767.0).astype(jnp.int16)
        elif audio_fmt == "i8bf":
            # block-float: one f32 scale per channel column per block + int8
            # mantissas — quarter of f32's bytes.  SNR is ~49 dB vs each
            # channel's own block peak (8-bit quantization), well above
            # voice-channel noise floors; exact zeros stay exact.
            a = packed["audio"]
            scale = jnp.max(jnp.abs(a), axis=0)  # [S or C]
            q = jnp.round(a * jnp.where(scale > 0.0, np.float32(127.0) / scale, 0.0)[None, :])
            packed["audio"] = q.astype(jnp.int8)
            packed["audio_scale"] = scale * np.float32(1.0 / 127.0)
        if with_afc:
            packed["spectrum_power"] = out["spectrum_power"]
        return st, packed

    if mesh is not None:
        final_st, packed = jax.lax.scan(body, state, x)  # x = (bodies [K, ...], tails [K, halo, 2])
    else:
        final_st, packed = jax.lax.scan(body, state, jnp.arange(k_blocks))
    if meta_per_chunk:
        # stats/TUI consume per-channel gauges/counters at a 15 s cadence
        # (reference: output.cpp:833-869) — fetching them per 125 ms block
        # is pure transfer waste at large C (8 rows x C x 4 B/block).  Ship
        # ONE chunk-end snapshot derived from the final carried state; the
        # per-block `active` flags (what drives sinks/activity counting)
        # still ship per block.
        sq, so = _state_meta(params, final_st)
        perm = (lambda a: a[inv_perm]) if inv_perm is not None else (lambda a: a)
        meta_f = jnp.stack([perm(final_st.pre_full), perm(final_st.noise_floor), perm(sq)])
        meta_i = jnp.stack([
            perm(final_st.open_count), perm(final_st.flappy_count),
            perm(final_st.slow.found), perm(final_st.slow.not_found),
            perm(so).astype(jnp.int32),
        ]).astype(jnp.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = lambda a: jax.lax.with_sharding_constraint(a, NamedSharding(mesh, P()))
            meta_f, meta_i = repl(meta_f), repl(meta_i)
        packed["meta_f"] = meta_f
        packed["meta_i"] = meta_i
    return final_st, packed


_WARM_THREADS: list = []  # all live flush-warm threads (pruned on track)
_WARM_NOTICE_REGISTERED = False


def _track_warm_thread(t) -> None:
    """Register t so that, if the interpreter exits while a warm compile is
    still running (Pipeline.close() skipped — exception, Ctrl-C), a NOTICE
    explains the stall before threading._shutdown blocks joining it.
    threading._register_atexit callbacks run at the START of
    threading._shutdown, i.e. BEFORE the non-daemon join (a plain atexit
    hook would fire only after the join completes — too late to matter)."""
    global _WARM_NOTICE_REGISTERED
    _WARM_THREADS[:] = [w for w in _WARM_THREADS if w.is_alive()]
    _WARM_THREADS.append(t)
    if not _WARM_NOTICE_REGISTERED:
        import threading

        def notice():
            alive = [w for w in _WARM_THREADS if w.is_alive()]
            if alive:
                from ..logutil import LOG_NOTICE, log

                log(
                    LOG_NOTICE,
                    f"exit waiting for {len(alive)} background warm-compile thread(s) "
                    "to finish (up to minutes through a remote TPU tunnel); call "
                    "Pipeline.close()/App.stop() before exit to avoid this",
                )

        try:
            threading._register_atexit(notice)
            _WARM_NOTICE_REGISTERED = True
        except Exception:  # private API; degrade to silence, never break
            _WARM_NOTICE_REGISTERED = True


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
    # throughput knobs (reference analog: thread-decoupled stages,
    # rtl_airband.cpp:1093-1112):
    chunk_blocks: int = 1  # blocks chained per device dispatch (lax.scan)
    async_depth: int = 0  # in-flight chunks before feed() yields (0 = sync)
    active_slots: int = 0  # >0: fetch only open channels' audio (S slots)
    fetch_open_flags: bool = False  # ship per-sample [W, C] flags (diagnostic)
    fetch_audio_i16: bool = False  # legacy alias for fetch_audio_fmt='i16'
    fetch_audio_fmt: str = ""  # '' | 'f32' | 'i16' | 'i8bf' (see pipeline_chain)
    suppress_fade_tails: bool = False  # host-synthesize closed-channel tails
    fetch_meta_per_chunk: bool = False  # one meta snapshot per chunk, not per block
    # multi-chip (reference analog: multiple_demod_threads device-data
    # parallelism, rtl_airband.cpp:1052-1090 — here one jit program spans a
    # ('time', 'chan') device mesh instead):
    mesh: object = None  # jax.sharding.Mesh | None
    demod_backend: str = "auto"  # 'auto' | 'xla' | 'pallas'
    pallas_interpret: bool = False  # CPU-mesh testing of the pallas branch

    @property
    def hop(self) -> int:
        return int(round(self.sample_rate / self.wave_rate))

    @property
    def wave_batch(self) -> int:
        return self.wave_rate // 8

    @property
    def audio_fmt(self) -> str:
        return self.fetch_audio_fmt or ("i16" if self.fetch_audio_i16 else "f32")


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
        # mesh mode: pad the device-side channel population up to a multiple
        # of the FULL device count so the per-channel demod stage always
        # shards over every device — without padding, an indivisible C (a
        # prime population, a lone scan channel) makes pick_channel_axes
        # fall back to replication and every device redundantly runs the
        # whole demod scan.  Padded slots are inert AM channels at the
        # device center (bin 0, ampfactor 0); they are appended AFTER the
        # cost-grouped user channels and dropped in-jit by the _inv_perm
        # gather, so nothing downstream (slot gather, meta, host) ever sees
        # them — the mesh stays bit-identical to the single-device path.
        self.C_dev = self.C
        self._pad_specs: list[ChannelSpec] = []
        if cfg.mesh is not None:
            total = int(np.prod([cfg.mesh.shape[a] for a in ("time", "chan")]))
            if self.C % total:
                self.C_dev = -(-self.C // total) * total
                self._pad_specs = [
                    ChannelSpec(frequency=cfg.center_freq, modulation="am", ampfactor=0.0)
                    for _ in range(self.C_dev - self.C)
                ]
        # cost-class grouping: device slot j processes user channel
        # _order[j], so the Pallas kernel's per-tile event gates (CTCSS
        # Goertzel bank) fire on as few tiles as possible; all per-channel
        # outputs are restored to user order in-jit via _inv_perm (which,
        # being a [C] gather over [C_dev] arrays, also drops the mesh pad).
        self._order = cost_group_permutation(specs)
        self._unperm = np.argsort(self._order).astype(np.int32)
        identity = np.array_equal(self._order, np.arange(self.C, dtype=np.int32))
        self._inv_perm = None if identity and not self._pad_specs else jnp.asarray(self._unperm)
        self.params = make_channel_params(
            [specs[i] for i in self._order] + self._pad_specs,
            wave_rate=cfg.wave_rate, sample_rate=cfg.sample_rate, center_freq=cfg.center_freq, fft_size=cfg.fft_size,
        )
        # FFT bin per channel in USER order (reference: config.cpp:661-664);
        # mutable for AFC/scan.  self.bins is the device-order copy.
        self.base_bins = np.array(
            [bin_for_freq(s.frequency, cfg.center_freq, cfg.sample_rate, cfg.fft_size) for s in specs], np.int32
        )
        self.user_bins = np.array(self.base_bins)
        self.bins = jnp.asarray(self._device_bins(self.base_bins))
        self._taps = jax.jit(make_taps)(self.bins, self.window)
        self.any_ctcss = bool(any(s.ctcss > 0 for s in specs))
        self.any_afc = bool(any(s.afc for s in specs))
        self.any_iq = bool(any(s.has_iq_outputs for s in specs))

        self._pending: np.ndarray | None = None  # raw 1-D or [L, 2] f32 pairs
        self._ship: str | None = None  # 'u8' | 's8' | 's16' | 'pairs' (lazy)
        self._inflight: list = []  # [(k_blocks, device outs)] FIFO
        self._primed = False
        self.state: DemodState | None = None
        self.blocks_processed = 0
        self.gather_overflow_count = 0  # active-gather slot overflows (see _to_host)
        self._flush_warmed = False  # k=1 chain pre-compiled (see _warm_flush_path)
        self._warm_threads: list = []  # background warm compiles (joined in close())
        # reused dense reconstruction buffers for active-gather mode (see
        # _to_host); yielded audio/iq are valid until the NEXT block
        self._dense_audio: np.ndarray | None = None
        self._dense_dirty: np.ndarray = np.zeros(0, np.int64)
        self._dense_iq: np.ndarray | None = None
        self._dense_iq_dirty: np.ndarray = np.zeros(0, np.int64)
        # fade-tail suppression host state (cfg.suppress_fade_tails): per
        # channel, the last emitted sample of the most recent SHIPPED block
        # (0 = nothing pending) + the one-time startup-prefix flag; the
        # synthesis factors 0.94^i are computed exactly as the device's
        # fade kernel computes them (ops/demod.py::apply_fade_and_tail)
        self._tail_pending = np.zeros(self.C, np.float32)
        self._tail_startup = True
        self._pow94 = np.power(np.float32(0.94), np.arange(1, AGC_EXTRA, dtype=np.float32))

        self._prime_len = (self.A - 1) * self.hop + self.N
        self._block_need = self.W * self.hop  # new samples consumed per block
        self._block_len = block_input_len(self.W, self.hop, self.N)

        # ---- multi-chip mesh mode -------------------------------------
        self.mesh = cfg.mesh
        if self.mesh is not None:
            T = self.mesh.shape["time"]
            if self.W % T:
                raise ValueError(f"wave_batch {self.W} not divisible by time shards {T}")
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import pick_channel_axes, shard_last

            chan_axes = pick_channel_axes(self.mesh, self.C_dev)
            self._repl = lambda tree: jax.tree.map(
                lambda l: jax.device_put(l, NamedSharding(self.mesh, P())), tree
            )
            self._shard_chan = lambda tree: shard_last(self.mesh, tree, axis=chan_axes, channel_dim=self.C_dev)
            self._tail_sharding = NamedSharding(self.mesh, P())
            self._body_sharding_raw = NamedSharding(self.mesh, P(None, "time"))
            self._body_sharding_pairs = NamedSharding(self.mesh, P(None, "time", None))
            self.params = self._shard_chan(self.params)
            self.window = self._repl(self.window)
            self.bins = self._repl(self.bins)
            self._taps = self._repl(self._taps)

    def _device_bins(self, user_bins: np.ndarray) -> np.ndarray:
        """User-order bins -> device order, with mesh-pad slots on bin 0."""
        dev = user_bins[self._order]
        if self._pad_specs:
            dev = np.concatenate([dev, np.zeros(len(self._pad_specs), np.int32)])
        return dev

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

    # -- raw-domain helpers: _pending holds either [L, 2] f32 pairs or the
    # -- raw interleaved stream (u8/s8 bytes as uint8, s16 as int16) that is
    # -- decoded ON DEVICE (decode_raw_iq) to quarter the H2D traffic.

    def _resolve_ship(self, raw) -> str:
        if isinstance(raw, (bytes, bytearray)) or (isinstance(raw, np.ndarray) and raw.dtype == np.uint8 and raw.ndim == 1):
            if self.cfg.sample_format in ("u8", "s8", "s16"):
                return self.cfg.sample_format
        return "pairs"

    def _ingest(self, raw) -> None:
        if self._ship is None:
            self._ship = self._resolve_ship(raw)
        if self._ship == "pairs":
            x = self._decode(raw)
        elif self._ship == "s16":
            b = bytes(raw) if isinstance(raw, (bytes, bytearray)) else np.asarray(raw, np.uint8).tobytes()
            x = np.frombuffer(b, np.int16)
        else:  # u8 / s8 ship as the byte stream
            x = np.frombuffer(raw, np.uint8) if isinstance(raw, (bytes, bytearray)) else np.asarray(raw, np.uint8)
        if self._pending is None or len(self._pending) == 0:
            self._pending = x
        else:
            self._pending = np.concatenate([self._pending, x], axis=0)

    def _pending_samples(self) -> int:
        if self._pending is None:
            return 0
        return self._pending.shape[0] if self._ship == "pairs" else self._pending.shape[0] // 2

    def _pending_slice(self, n_samples: int):
        """First n_samples of the pending stream, in ship domain."""
        return self._pending[:n_samples] if self._ship == "pairs" else self._pending[: 2 * n_samples]

    def _pending_consume(self, n_samples: int) -> None:
        self._pending = self._pending[n_samples:] if self._ship == "pairs" else self._pending[2 * n_samples :]

    def _chain_kwargs(self, ship: str | None = None) -> dict:
        if ship is None:
            ship = self._ship
        return dict(
            hop=self.hop, fft_size=self.N, n_frames=self.W,
            use_fft=self.cfg.channelizer == "fft", fm_quadri=self.cfg.fm_quadri,
            with_ctcss=self.any_ctcss, with_afc=self.any_afc, with_iq=self.any_iq,
            sample_fmt=ship if ship != "pairs" else "pairs",
            fullscale=float(self.cfg.fullscale),
            active_slots=max(0, int(self.cfg.active_slots)),
            with_flags=bool(self.cfg.fetch_open_flags),
            audio_fmt=self.cfg.audio_fmt,
            suppress_fade_tails=bool(self.cfg.suppress_fade_tails) and int(self.cfg.active_slots) > 0,
            meta_per_chunk=bool(self.cfg.fetch_meta_per_chunk),
            demod_backend=self.cfg.demod_backend,
            mesh=self.mesh,
            pallas_interpret=bool(self.cfg.pallas_interpret),
        )

    def _stacked_input(self, k: int):
        """Mesh-mode chain input: per-block (bodies, tails) stacks, bodies
        laid out P(None, 'time') so each time shard's slice boundary is
        static (blocks overlap by the halo -> ~0.1% of the stream re-ships).
        Tails are tiny (fft_size-hop samples) and ship as replicated f32
        pairs regardless of the raw format."""
        body, halo = self._block_need, self.N - self.hop
        if self._ship == "pairs":
            p = self._pending
            bodies = np.stack([p[j * body : (j + 1) * body] for j in range(k)])
            tails = np.stack([p[(j + 1) * body : (j + 1) * body + halo] for j in range(k)])
        else:
            p = self._pending  # raw domain: 2 values per sample
            bodies = np.stack([p[2 * j * body : 2 * (j + 1) * body] for j in range(k)])
            tails = np.stack(
                [self._decode(p[2 * (j + 1) * body : 2 * ((j + 1) * body + halo)].tobytes()) for j in range(k)]
            )
        xb = jax.device_put(bodies, self._body_sharding_raw if self._ship != "pairs" else self._body_sharding_pairs)
        xt = jax.device_put(tails.astype(np.float32), self._tail_sharding)
        return xb, xt

    def _dispatch(self, k: int) -> None:
        """Launch one k-block chained dispatch on the pending stream."""
        if self.mesh is not None:
            xb = self._stacked_input(k)
        else:
            n_in = (k * self.W - 1) * self.hop + self.N
            xb = jnp.asarray(self._pending_slice(n_in))
        self.state, outs = pipeline_chain(
            xb, self.bins, self.window, self.params, self.state,
            k_blocks=k, taps=self._taps, inv_perm=self._inv_perm, **self._chain_kwargs(),
        )
        self._pending_consume(k * self._block_need)
        self.blocks_processed += k
        self._inflight.append((k, outs))
        if k > 1:
            self._warm_flush_path()

    def warm(self, k_blocks: int | None = None, *, slots: int | None = None, fmt: str | None = None) -> None:
        """Synchronously compile the k-block chain program (and prime-step
        program) on zeroed inputs before streaming starts.  jit functions are
        pure, so nothing observable changes; pipelines with identical
        statics share the compiled program within the process.  Use before
        real-time ingest on backends with slow compiles (the axon tunnel
        compiles the production chain in minutes and cannot cache across
        processes — CLAUDE.md)."""
        k = k_blocks if k_blocks is not None else max(1, int(self.cfg.chunk_blocks))
        # guess the ship format WITHOUT pinning self._ship: feed() documents
        # that decoded arrays (complex64 / [L, 2] f32 pairs) are accepted even
        # when cfg.sample_format is raw, and _resolve_ship must still see the
        # actual first payload — a warm-time pin would route floats through
        # the raw-ship branch and value-cast them to bytes (round-3 advisory)
        ship = self._ship or (self.cfg.sample_format if self.cfg.sample_format in ("u8", "s8", "s16") else "pairs")
        kwargs = self._chain_kwargs(ship)
        if slots is not None:  # fetch-economy rung warm (see apply_rung)
            kwargs["active_slots"] = max(0, int(slots))
        if fmt is not None:
            kwargs["audio_fmt"] = fmt
        mags = jnp.zeros((self.A, self.C_dev), jnp.float32)
        state = init_demod_state(self.C_dev, mags, jnp.zeros((self.A, self.C_dev, 2), jnp.float32))
        if self.mesh is not None:
            state = self._shard_chan(state)
            body, halo = self._block_need, self.N - self.hop
            if kwargs["sample_fmt"] == "pairs":
                zb = np.zeros((k, body, 2), np.float32)
            else:
                zb = np.zeros((k, 2 * body), np.int16 if kwargs["sample_fmt"] == "s16" else np.uint8)
            xb = (
                jax.device_put(zb, self._body_sharding_raw if kwargs["sample_fmt"] != "pairs" else self._body_sharding_pairs),
                jax.device_put(np.zeros((k, halo, 2), np.float32), self._tail_sharding),
            )
        else:
            n_in = (k * self.W - 1) * self.hop + self.N
            if kwargs["sample_fmt"] == "pairs":
                xb = jnp.zeros((n_in, 2), jnp.float32)
            else:
                xb = jnp.zeros(2 * n_in, jnp.int16 if kwargs["sample_fmt"] == "s16" else jnp.uint8)
        st, outs = pipeline_chain(xb, self.bins, self.window, self.params, state, k_blocks=k, taps=self._taps, inv_perm=self._inv_perm, **kwargs)
        jax.block_until_ready(st)
        # the prime channelizer program too (first feed() call)
        prime = jnp.zeros((self._prime_len, 2), jnp.float32)
        jax.block_until_ready(
            channelize_block(prime, self.bins, self.window, hop=self.hop, fft_size=self.N, n_frames=self.A, use_fft=self.cfg.channelizer == "fft")
        )

    def _warm_flush_path(self) -> None:
        """Pre-compile the k=1 chain in a daemon thread.  flush() (stream
        end, device failure, retune drain) dispatches single blocks; without
        this, the first flush after a chunked stream stalls for the full k=1
        compile (~36 s through the axon tunnel).  Warming it in the
        background during steady streaming makes flush a cache hit.  The
        warm call runs on zeroed inputs and a zeroed state copy — jit
        functions are pure, so nothing observable changes."""
        if self._flush_warmed:
            return
        self._flush_warmed = True
        import threading

        state = jax.tree.map(jnp.zeros_like, self.state)
        kwargs = self._chain_kwargs()
        taps, inv_perm, bins, window, params = self._taps, self._inv_perm, self.bins, self.window, self.params
        n_in = (self.W - 1) * self.hop + self.N
        body, halo = self._block_need, self.N - self.hop
        raw_dtype = {"pairs": jnp.float32, "s16": jnp.int16}.get(kwargs["sample_fmt"], jnp.uint8)
        if self.mesh is not None:
            zb = np.zeros((1, body, 2), np.float32) if kwargs["sample_fmt"] == "pairs" else np.zeros((1, 2 * body), raw_dtype)
            xb = (
                jax.device_put(zb, self._body_sharding_raw if kwargs["sample_fmt"] != "pairs" else self._body_sharding_pairs),
                jax.device_put(np.zeros((1, halo, 2), np.float32), self._tail_sharding),
            )
        elif kwargs["sample_fmt"] == "pairs":
            xb = jnp.zeros((n_in, 2), jnp.float32)
        else:
            xb = jnp.zeros(2 * n_in, raw_dtype)

        def work():
            try:
                st, outs = pipeline_chain(xb, bins, window, params, state, k_blocks=1, taps=taps, inv_perm=inv_perm, **kwargs)
                jax.block_until_ready(st)
            except Exception:
                pass  # warm-up is best-effort; flush falls back to compiling

        # NON-daemon and tracked: a daemon thread still inside XLA when the
        # interpreter exits aborts C++ teardown ("FATAL: exception not
        # rethrown", rc 134/139).  The reference guarantees an ordered
        # join-everything shutdown (rtl_airband.cpp:1114-1158); close() is
        # our equivalent, and non-daemon means even an unclosed Pipeline
        # cannot crash process exit (threading._shutdown joins it first).
        # If close() is skipped (exception, Ctrl-C) that implicit join can
        # stall exit for the full compile (~minutes through the axon
        # tunnel) — _warm_exit_notice explains why instead of hanging mute.
        self._warm_threads = [t for t in self._warm_threads if t.is_alive()]
        t = threading.Thread(target=work, daemon=False, name="flush-warm")
        self._warm_threads.append(t)
        _track_warm_thread(t)
        t.start()

    def warm_async(self, k_blocks: int | None = None, *, slots: int | None = None, fmt: str | None = None) -> None:
        """Background-compile an alternate (active_slots, audio_fmt) program
        — the fetch-economy ladder's neighbor rungs (runtime/economy.py) —
        without stalling streaming.  jit-pure; joined in close()."""
        import threading

        def work():
            try:
                self.warm(k_blocks, slots=slots, fmt=fmt)
            except Exception:
                pass  # best-effort; a real shift falls back to compiling

        self._warm_threads = [t for t in self._warm_threads if t.is_alive()]
        t = threading.Thread(target=work, daemon=False, name="rung-warm")
        self._warm_threads.append(t)
        _track_warm_thread(t)
        t.start()

    def apply_rung(self, slots: int, fmt: str) -> None:
        """Fetch-economy shift: the NEXT dispatch uses the new active_slots /
        audio_fmt (both are read from cfg per dispatch; in-flight chunks
        drain with the program that produced them — _to_host unpacks by
        content).  Cheap when the rung's program was pre-warmed."""
        self.cfg.active_slots = int(slots)
        self.cfg.fetch_audio_fmt = fmt

    def close(self) -> None:
        """Join background warm-compile threads.  Call at shutdown before
        interpreter exit (App.stop() does); idempotent.  The in-flight chunk
        queue is left alone — iterate :meth:`flush` first if the dispatched
        audio matters."""
        for t in self._warm_threads:
            t.join()
        self._warm_threads = []

    def _to_host(self, item) -> Iterator[dict]:
        """Fetch one in-flight chunk and unpack it into per-block dicts with
        the same keys pipeline_block returns.  In active-gather mode
        (cfg.active_slots > 0) the dense [W, C] audio/iq are reconstructed by
        scattering the fetched open-channel slots over silence; slot overflow
        (more open channels than slots) is counted in
        ``gather_overflow_count`` and the overflowed channels stay silent for
        the block."""
        k, outs = item
        host = jax.device_get(outs)
        if host["audio"].dtype == np.int16:  # i16 fetch -> restore float
            host = dict(host, audio=host["audio"].astype(np.float32) * (1.0 / 32767.0))
        elif host["audio"].dtype == np.int8:  # block-float fetch -> restore
            host = dict(host, audio=host["audio"].astype(np.float32) * host["audio_scale"][:, None, :])
        for i in range(k):
            out = dict(active=host["active"][i])
            if "slot_channel" in host:
                idx = host["slot_channel"][i]
                valid = idx >= 0
                # the dense [W, C] buffer is REUSED between blocks (yielded
                # audio is valid until the next block is yielded — consumers
                # that retain it must copy): at C=8192 a fresh np.zeros is
                # 65 MB of page faults per block, while re-zeroing only the
                # previously-scattered columns is ~100x less memory traffic
                audio = self._dense_audio
                if audio is None or audio.shape != (self.W, self.C):
                    audio = self._dense_audio = np.zeros((self.W, self.C), np.float32)
                else:
                    audio[:, self._dense_dirty] = 0.0
                cols = idx[valid]
                audio[:, cols] = host["audio"][i][:, valid]
                self._dense_dirty = cols
                if self.cfg.suppress_fade_tails:
                    A = self.A
                    if self._tail_startup:
                        # block 0: every unshipped channel carries the
                        # reference-faithful 0.5-initialized waveout tail
                        # (config.cpp:315) in its first AGC_EXTRA samples
                        mask = np.ones(self.C, bool)
                        mask[cols] = False
                        synth = np.flatnonzero(mask)
                        audio[:A, synth] = np.float32(0.5)
                        self._tail_startup = False
                    else:
                        synth = np.flatnonzero(self._tail_pending)
                        if len(synth):
                            synth = synth[~np.isin(synth, cols, assume_unique=False)]
                        if len(synth):
                            # AM squelch-close fade continuation: v·0.94^(i+1)
                            # from the channel's last shipped sample (the
                            # device's exact kernel computes base·0.94^i from
                            # the close point; restarting the geometric decay
                            # from the block-boundary sample differs only in
                            # f32 rounding — bounded by test_pipeline_chain's
                            # suppression SNR assertion)
                            audio[: A - 1, synth] = self._tail_pending[synth][None, :] * self._pow94[:, None]
                    self._tail_pending[:] = 0.0
                    if len(cols):
                        self._tail_pending[cols] = audio[-1, cols]
                    if len(synth):
                        self._dense_dirty = np.concatenate([cols, synth])
                out["audio"] = audio
                dropped = int(host["n_active"][i]) - int(valid.sum())
                out["gather_overflow"] = max(0, dropped)
                self.gather_overflow_count += out["gather_overflow"]
                if "iq_out" in host:
                    iq = self._dense_iq
                    if iq is None or iq.shape != (self.W, self.C, 2):
                        iq = self._dense_iq = np.zeros((self.W, self.C, 2), np.float32)
                    else:
                        iq[:, self._dense_iq_dirty] = 0.0
                    iq[:, cols] = host["iq_out"][i][:, valid]
                    self._dense_iq_dirty = cols
                    out["iq_out"] = iq
            else:
                out["audio"] = host["audio"][i]
                if "iq_out" in host:
                    out["iq_out"] = host["iq_out"][i]
            if "open_flags" in host:
                out["open_flags"] = host["open_flags"][i]
            # meta is [K, rows, C] per block, or [rows, C] once per chunk
            # (cfg.fetch_meta_per_chunk): chunk-end values stand in for every
            # block of the chunk — indistinguishable at the 15 s stats cadence
            mf = host["meta_f"] if host["meta_f"].ndim == 2 else host["meta_f"][i]
            mi = host["meta_i"] if host["meta_i"].ndim == 2 else host["meta_i"][i]
            for j, name in enumerate(META_F):
                out[name] = mf[j]
            for j, name in enumerate(META_I):
                out[name] = mi[j]
            out["sig_outside"] = mi[len(META_I)].astype(bool)
            if "spectrum_power" in host:
                out["spectrum_power"] = host["spectrum_power"][i]
            yield out

    def feed(self, raw) -> Iterator[dict]:
        """Feed IQ (complex64 array, [L, 2] f32 pairs, or raw bytes in the
        configured sample format).  Yields one result dict per completed
        block.

        Blocks are dispatched ``cfg.chunk_blocks`` at a time and results are
        yielded ``cfg.async_depth`` chunks behind the dispatch front, so the
        host fetch of chunk n-1 (and the H2D of chunk n+1) overlaps device
        compute of chunk n — the reference decouples the same stages with
        threads (rtl_airband.cpp:1093-1112).  Call :meth:`flush` at stream
        end to drain.

        In active-gather mode (cfg.active_slots > 0) the yielded dense
        ``audio``/``iq_out`` arrays are REUSED between blocks — they are
        valid until the next block is yielded; copy if retained."""
        self._ingest(raw)

        if not self._primed:
            if self._pending_samples() < self._prime_len:
                return
            prime = self._pending_slice(self._prime_len)
            if self._ship != "pairs":
                prime = self._decode(prime.tobytes())
            mags, iqs = channelize_block(
                jnp.asarray(prime), self.bins, self.window,
                hop=self.hop, fft_size=self.N, n_frames=self.A, use_fft=self.cfg.channelizer == "fft",
            )
            self.state = init_demod_state(self.C_dev, mags, iqs)
            if self.mesh is not None:
                self.state = self._shard_chan(self.state)
            self._pending_consume(self.A * self.hop)
            self._primed = True

        K = max(1, int(self.cfg.chunk_blocks))
        chunk_len = (K * self.W - 1) * self.hop + self.N
        while self._pending_samples() >= chunk_len:
            self._dispatch(K)
            while len(self._inflight) > max(0, int(self.cfg.async_depth)):
                yield from self._to_host(self._inflight.pop(0))

    def flush(self) -> Iterator[dict]:
        """Drain: process any remaining complete single blocks, then fetch
        every in-flight chunk.  Call at stream end / shutdown / retune."""
        if self._primed:
            while self._pending_samples() >= self._block_len:
                self._dispatch(1)
        while self._inflight:
            yield from self._to_host(self._inflight.pop(0))

    # -------------------------------------------------------- checkpointing

    def save_state(self, path: str) -> None:
        """Checkpoint the carried DSP state (squelch/AGC/filter/Goertzel
        recurrences + stream alignment) so a restarted process can resume
        demodulation gaplessly.  The reference has no DSP checkpointing —
        its recovery is reconnect/drop-audio (SURVEY.md §5)."""
        import numpy as np

        if self.state is None:
            raise RuntimeError("pipeline not primed; nothing to checkpoint")
        if self._inflight:
            raise RuntimeError("in-flight chunks pending; iterate flush() before save_state")
        flat = {}
        for name in self.state._fields:
            leaf = getattr(self.state, name)
            if hasattr(leaf, "_fields"):  # nested CtcssState
                for sub in leaf._fields:
                    flat[f"state.{name}.{sub}"] = np.asarray(getattr(leaf, sub))
            else:
                flat[f"state.{name}"] = np.asarray(leaf)
        flat["pending"] = self._pending if self._pending is not None else np.zeros((0, 2), np.float32)
        flat["ship"] = np.str_(self._ship or "")
        flat["tail_pending"] = self._tail_pending
        flat["tail_startup"] = np.bool_(self._tail_startup)
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
        ship = str(d["ship"]) if "ship" in d else "pairs"
        self._ship = ship or None
        dev_bins = np.asarray(d["bins"], np.int32)  # saved in device order
        self.bins = jnp.asarray(dev_bins)
        self.user_bins = dev_bins[self._unperm]
        self._taps = jax.jit(make_taps)(self.bins, self.window)
        if self.mesh is not None:
            self.state = self._shard_chan(self.state)
            self.bins, self._taps = self._repl(self.bins), self._repl(self._taps)
        self.blocks_processed = int(d["blocks_processed"])
        if "tail_pending" in d:
            self._tail_pending = np.asarray(d["tail_pending"], np.float32).copy()
            self._tail_startup = bool(d["tail_startup"])
        else:  # older checkpoint: past startup, no fade pending
            self._tail_pending[:] = 0.0
            self._tail_startup = False
        self._primed = True

    # ------------------------------------------------------------ mutation

    def set_bins(self, bins) -> None:
        """AFC / scan retune: move channels to new FFT bins (USER channel
        order).  The DFT taps are re-derived by one tiny jitted call (bins
        change at 200 ms/2 s control cadence, not per block)."""
        self.user_bins = np.asarray(bins, np.int32).copy()
        self.bins = jnp.asarray(self._device_bins(self.user_bins))
        self._taps = jax.jit(make_taps)(self.bins, self.window)
        if self.mesh is not None:
            self.bins, self._taps = self._repl(self.bins), self._repl(self._taps)

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
        identity = np.array_equal(self._order, np.arange(self.C, dtype=np.int32))
        self._inv_perm = None if identity and not self._pad_specs else jnp.asarray(self._unperm)
        self.params = make_channel_params(
            [specs[i] for i in self._order] + self._pad_specs,
            wave_rate=cfg.wave_rate, sample_rate=cfg.sample_rate, center_freq=cfg.center_freq, fft_size=cfg.fft_size,
        )
        self.base_bins = np.array(
            [bin_for_freq(s.frequency, cfg.center_freq, cfg.sample_rate, cfg.fft_size) for s in specs], np.int32
        )
        self.user_bins = np.array(self.base_bins)
        self.bins = jnp.asarray(self._device_bins(self.base_bins))
        self._taps = jax.jit(make_taps)(self.bins, self.window)
        if self.mesh is not None:
            self.params = self._shard_chan(self.params)
            self.bins, self._taps = self._repl(self.bins), self._repl(self._taps)
        # drop buffered samples from the old tuning and re-prime; in-flight
        # chunks from the old tuning stay queued and drain in FIFO order
        self._pending = None
        self._primed = False
        # re-priming re-creates the 0.5-initialized waveout tail -> the
        # fade-suppression host state starts over
        self._tail_pending[:] = 0.0
        self._tail_startup = True
        # feature flags may have changed -> the k=1 flush program may differ
        self._flush_warmed = False
