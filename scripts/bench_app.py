#!/usr/bin/env python
"""App-level benchmark: the FULL production path on the real chip.

Unlike bench.py (which times the jitted device step alone via an on-device
checksum), this drives the whole application exactly as a user would run it:
libconfig text -> load_config -> App -> file input thread -> ring buffer ->
Pipeline (chunked dispatch + async double-buffering) -> host block handler ->
per-channel UDP sinks.  It answers VERDICT r1's "production-path streaming
performance" question: what does one block cost END TO END, including the
host<->device tunnel fetches and all host sink work?

Scene: noise floor + AM carriers on ~0.4% of channels (min 4) so a realistic
handful of squelches open and their sinks actually send audio; one channel
carries CTCSS so the kernel compiles with the same with_ctcss=True graph as
bench.py.

Protocol: `speedup_factor = 0` (unpaced file read — input is never the
bottleneck), run the App loop over a BENCH_APP_SECONDS recording, timestamp
every handled block, drop the warmup chunk (contains the jit compile), report
steady-state wall ms per block.

Env knobs: BENCH_APP_CHANNELS (default 2048), BENCH_APP_SECONDS (default 24),
BENCH_APP_BLOCKS_PER_DISPATCH (default 16, matching bench.py),
BENCH_APP_ACTIVE_SLOTS, BENCH_APP_FMT (f32|i16|i8bf), BENCH_APP_SUPPRESS=1
(fade-tail suppression), BENCH_APP_OPEN_FRAC (fixed-open-fraction scene
family — carriers sized so ~frac of channels are open regardless of
channel count, making 2048/8192/16384-ch numbers comparable),
BENCH_APP_PACED=1 (speedup_factor=1 real-time pacing + ingest->handled
latency stats), BENCH_APP_ECON=1 (fetch_economy=auto + pre-warmed roomy
rung: demonstrates the controller resolving sustained slot overflow).

Prints ONE JSON line, e.g.
  {"metric": "app_block_time", "value": ..., "unit": "ms/block", ...}

Reference analog: the thread-decoupled production loop
/root/reference/src/rtl_airband.cpp:1056-1112 feeding demod + output threads.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scene(path: str, freqs_hz: list[int], hot: list[int], center: int, fs: int, total: int, wave_rate: int) -> None:
    from rtlsdr_airband_tpu.utils.siggen import complex_noise

    # Scene design notes (hard-won -- each clause prevents a failure mode
    # that spuriously opened thousands of channels' squelch):
    #  - noise well above 1 u8 LSB so the floor isn't quantization-limited;
    #  - carrier amplitudes scaled so the SUM stays inside the u8 range
    #    (clipping splatter is broadband);
    #  - the modulating tone synthesized at the FULL IQ rate -- zero-order-
    #    hold upsampling of audio-rate tones leaves 16 kHz-spaced spectral
    #    replica combs across the whole band;
    #  - carriers key ON after a quiet lead-in: with an always-on carrier
    #    the min-tracking noise floor converges onto the carrier itself and
    #    squelch never opens (reference semantics, squelch.cpp:477-490).
    z = complex_noise(total, 0.02, seed=11)
    t_full = np.arange(total, dtype=np.float64) / fs
    ampl = min(0.4, 0.5 / np.sqrt(max(1, len(hot))))
    gate = (np.arange(total) >= int(total * 0.25)).astype(np.float32)
    for k, ci in enumerate(hot):
        env = 1.0 + 0.5 * 0.7 * np.sin(2 * np.pi * (500.0 + 130.0 * k) * t_full)
        ph = 2 * np.pi * (freqs_hz[ci] - center) * t_full
        z += (ampl * env * np.exp(1j * ph)).astype(np.complex64) * gate
    iq = np.empty(total * 2, np.float32)
    iq[0::2], iq[1::2] = z.real, z.imag
    u8 = np.clip(np.round(iq * 127.5 + 127.5), 0, 255).astype(np.uint8)
    u8.tofile(path)


def main() -> int:
    n_channels = int(os.environ.get("BENCH_APP_CHANNELS", "2048"))
    seconds = float(os.environ.get("BENCH_APP_SECONDS", "24"))
    chunk = int(os.environ.get("BENCH_APP_BLOCKS_PER_DISPATCH", "16"))
    slots = int(os.environ.get("BENCH_APP_ACTIVE_SLOTS", "0"))
    # BENCH_APP_DEVICES=N splits the channel population over N file devices
    # with multiple_demod_threads=true (one demod worker per device,
    # reference: rtl_airband.cpp:809-816) — per-device block time within
    # ~10% of the 1-device number demonstrates fetch/compute overlap
    n_devices = int(os.environ.get("BENCH_APP_DEVICES", "1"))
    i16 = os.environ.get("BENCH_APP_I16", "0") == "1"
    fmt = os.environ.get("BENCH_APP_FMT", "")  # '' | f32 | i16 | i8bf
    suppress = os.environ.get("BENCH_APP_SUPPRESS", "0") == "1"
    metapc = os.environ.get("BENCH_APP_METAPC", "0") == "1"
    paced = os.environ.get("BENCH_APP_PACED", "0") == "1"
    econ = os.environ.get("BENCH_APP_ECON", "0") == "1"
    # BENCH_APP_MOT=1: per-device sink worker threads (multiple_output_threads)
    # move the per-block UDP/tobytes host work off the block loop so it
    # overlaps the D2H fetch wait (reference: rtl_airband.cpp:817-819)
    mot = os.environ.get("BENCH_APP_MOT", "0") == "1"

    if os.environ.get("BENCH_APP_CPU", "0") == "1":
        # smoke-test the script logic off-chip (numbers meaningless): the
        # env var route is ignored here (CLAUDE.md) — pin in-process
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from rtlsdr_airband_tpu.app import App
    from rtlsdr_airband_tpu.models.flagship import flagship_specs
    from rtlsdr_airband_tpu.runtime.config import load_config

    center, fs, wave_rate = 120_000_000, 2_560_000, 16000
    specs = flagship_specs(n_channels, center, fs)
    freqs = [s.frequency for s in specs]
    # BENCH_APP_HOT overrides the carrier count: each carrier opens its whole
    # FFT-bin group (n_channels/512 channels) PLUS the Blackman-Harris-7
    # mainlobe neighbours (~±2 bins above a midway threshold), so at 8192
    # channels one carrier opens ~80-150 channels — size the hot set so the
    # opened population stays inside active_fetch_slots.
    # BENCH_APP_OPEN_FRAC instead sizes the hot set for a FIXED open
    # FRACTION regardless of channel count (the comparable scene family,
    # round-4 VERDICT weak #5): measured across rounds each carrier opens
    # ~8.2 bins' worth of channels = 8.2*C/512, so carriers for fraction f
    # is ~f*512/8.2 ~= 62*f, independent of C (round-4 anchors: 4 carriers
    # -> 492/8192 = 6.0%; 8 carriers -> 278/2048 = 13.6%).
    open_frac = float(os.environ.get("BENCH_APP_OPEN_FRAC", "0") or 0)
    if open_frac > 0:
        n_hot = max(1, round(62.0 * open_frac))
    else:
        n_hot = int(os.environ.get("BENCH_APP_HOT", "0")) or max(4, n_channels // 256)
    hot = [int(i) for i in np.linspace(0, n_channels - 1, n_hot).astype(int)]

    # size the recording so the chunked dispatch consumes it EXACTLY: the
    # priming step eats AGC_EXTRA frames, then n_chunks full K-block chunks;
    # a ragged tail would make flush() compile a separate k=1 program (a
    # ~36 s stall through the tunnel) inside the measurement window
    from rtlsdr_airband_tpu.constants import AGC_EXTRA

    hop, fft_size, W = fs // wave_rate, 512, wave_rate // 8
    n_chunks = max(1, round(seconds / 0.125 / chunk))
    total = AGC_EXTRA * hop + n_chunks * chunk * W * hop + (fft_size - hop)

    tmp = tempfile.mkdtemp(prefix="bench_app_")
    iq_path = os.path.join(tmp, "scene.cu8")
    build_scene(iq_path, freqs, hot, center, fs, total, wave_rate)

    # Manual squelch threshold midway (log scale) between the noise bin level
    # (sigma*sqrt(sum w^2) ~ 0.15) and the carrier bin level (~ampl*sum(w)/2):
    # deterministic open set regardless of noise-floor adaptation dynamics.
    # (At 8192 channels the population shares 512 bins ~16-deep, so each
    # carrier opens its whole bin group — the open fraction stays realistic.)
    from rtlsdr_airband_tpu.ops.levels import level_to_dbfs

    thr_dbfs = round(float(level_to_dbfs(1.0, 512)), 1)

    # one CTCSS channel so the device graph matches bench.py (with_ctcss=True)
    chans = []
    for i, f in enumerate(freqs):
        extra = " ctcss = 100.0;" if i == min(h for h in hot) else ""
        chans.append(
            f'{{ freq = {f}; modulation = "am";{extra} squelch_threshold = {thr_dbfs}; '
            f'outputs: ( {{ type = "udp_stream"; '
            f'dest_address = "127.0.0.1"; dest_port = {20000 + (i % 8000)}; }} ); }}'
        )
    per_dev = len(chans) // n_devices
    speedup = "1.0" if paced else "0.0"
    devs = ", ".join(
        f'{{ type = "file"; filepath = "{iq_path}"; centerfreq = {center}; '
        f'sample_rate = {fs}; sample_format = "u8"; speedup_factor = {speedup}; '
        f'channels: ( {", ".join(chans[d * per_dev : (d + 1) * per_dev])} ); }}'
        for d in range(n_devices)
    )
    cfg_text = (
        f'fft_size = 512;\nwave_rate = {wave_rate};\n'
        f'blocks_per_dispatch = {chunk};\nactive_fetch_slots = {slots};\n'
        + ("fetch_audio_i16 = true;\n" if i16 else "")
        + (f'fetch_audio_fmt = "{fmt}";\n' if fmt else "")
        + ("suppress_fade_tails = true;\n" if suppress else "")
        + ("fetch_meta_per_chunk = true;\n" if metapc else "")
        + ('fetch_economy = "auto";\n' if econ else "")
        + ("multiple_output_threads = true;\n" if mot else "")
        + ("multiple_demod_threads = true;\n" if n_devices > 1 else "")
        + f'devices: ( {devs} );\n'
    )
    cfg_path = os.path.join(tmp, "bench.conf")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    t0 = time.perf_counter()
    cfg = load_config(cfg_path)
    t_parse = time.perf_counter() - t0

    app = App(cfg)
    # compile every device's chain program BEFORE streaming starts — the
    # axon tunnel compiles the production chain in minutes and cannot cache
    # across processes, and an unpaced file input would drain (and overflow
    # the ring) while the first dispatch compiles.  Identical statics share
    # one compiled program across devices.
    t0 = time.perf_counter()
    for rt in app.devices:
        rt.pipeline.warm(1 if (rt.scan is not None or any(c.afc for c in rt.channels)) else chunk)
    if econ:
        # pre-warm the overflow-target (roomy) rung + down-neighbor so the
        # demonstrated shift is a compile-cache hit, not a mid-bench stall
        for rt in app.devices:
            if rt.economy is not None:
                targets = sorted({0, *rt.economy.neighbors()} - {rt.economy.idx})
                for ti in targets:
                    r = rt.economy.rungs[ti]
                    print(f"[bench_app] warming econ rung {r}", file=sys.stderr, flush=True)
                    rt.pipeline.warm(chunk, slots=r.slots, fmt=r.fmt)
    t_compile = time.perf_counter() - t0
    print(f"[bench_app] warm/compile {t_compile:.1f}s", file=sys.stderr, flush=True)

    stamps: list[float] = []
    orig = app._handle_block

    def timed(rt, out):
        orig(rt, out)
        stamps.append(time.perf_counter())
        n = len(stamps)
        if n == 1 or n % 64 == 0:
            print(f"[bench_app] block {n} @ t+{stamps[-1] - t0:.1f}s", file=sys.stderr, flush=True)

    app._handle_block = timed

    t_stream = None
    if paced:
        # capture the exact instant the paced reader starts (its wall-clock
        # pacing origin) so per-block availability times are honest
        started_at = {}
        for rt in app.devices:
            orig_start = rt.input.start

            def make(idx, orig_start):
                def s():
                    started_at[idx] = time.perf_counter()
                    return orig_start()

                return s

            rt.input.start = make(rt.stats.index, orig_start)

    t0 = time.perf_counter()
    if paced:
        # real-time ingest: run the service loop ourselves so we know the
        # stream origin; blocks must be handled as fast as they arrive
        app.start()
        t_stream = started_at.get(0, t0)
        try:
            while not app.do_exit:
                worked = app._service_once()
                if not any(rt.alive for rt in app.devices):
                    break
                if time.perf_counter() - t0 > 600.0:
                    break
                if not worked:
                    time.sleep(0.002)
        finally:
            app.stop()
    else:
        app.run(max_seconds=600.0)
    wall = time.perf_counter() - t0

    n = len(stamps)
    expected = n_chunks * chunk * n_devices
    # steady state: drop the first chunk (jit compile + pipeline fill)
    k = min(2 * chunk * n_devices, n // 2)
    steady_ms = (stamps[-1] - stamps[k - 1]) / (n - k) * 1e3 if n > k else float("nan")
    per_device_ms = steady_ms * n_devices
    block_realtime_ms = 125.0
    opened = sum(int(st.squelch_open_count > 0) for rt in app.devices for ch in rt.channels for st in ch.stats)

    result = {
        "metric": "app_block_time",
        "value": round(steady_ms, 3),
        "unit": "ms/block",
        "vs_baseline": round(block_realtime_ms / per_device_ms, 2),  # per-device realtime factor
        "detail": {
            "n_channels": n_channels,
            "n_devices": n_devices,
            "per_device_block_ms": round(per_device_ms, 3),
            "blocks": n,
            "blocks_expected": expected,
            "wall_s": round(wall, 2),
            "config_parse_s": round(t_parse, 2),
            "compile_s": round(t_compile, 1),
            "blocks_per_dispatch": chunk,
            "active_fetch_slots": slots,
            "fetch_audio_i16": i16,
            "hot_channels": len(hot),
            "channels_opened": opened,
            "gather_overflows": sum(rt.pipeline.gather_overflow_count for rt in app.devices),
            "realtime_channel_capacity": int(n_channels * block_realtime_ms / steady_ms),
            "fetch_mb_per_block": round(
                W * (slots or n_channels // n_devices) * {"f32": 4, "i16": 2, "i8bf": 1}.get(fmt or ("i16" if i16 else "f32"), 4) / 1e6, 2
            ),
            "audio_fmt": fmt or ("i16" if i16 else "f32"),
            "suppress_fade_tails": suppress,
            "meta_per_chunk": metapc,
            "open_frac_requested": open_frac or None,
        },
    }
    if paced and n > k and t_stream is not None:
        # ingest->handled latency per steady-state block: block b's final
        # input sample becomes available at t_stream + (prime + (b+1)·W)·hop/fs
        import numpy as _np

        lat = []
        for b in range(k, n):
            avail = t_stream + (AGC_EXTRA + (b + 1) * W) * hop / fs
            lat.append((stamps[b] - avail) * 1e3)
        lat = _np.asarray(lat)
        result["detail"]["paced"] = True
        result["detail"]["latency_ms_p50"] = round(float(_np.percentile(lat, 50)), 1)
        result["detail"]["latency_ms_p95"] = round(float(_np.percentile(lat, 95)), 1)
        result["detail"]["latency_ms_max"] = round(float(lat.max()), 1)
        # a transport stall early in the run leaves a permanent backlog when
        # per-block cost ~= the 125 ms budget (no catch-up headroom), which
        # poisons whole-run percentiles; the last-third tail is the honest
        # steady-state latency when it has converged
        tail = lat[-max(8, len(lat) // 3) :]
        result["detail"]["latency_ms_tail_p50"] = round(float(_np.percentile(tail, 50)), 1)
        result["detail"]["latency_ms_tail_p95"] = round(float(_np.percentile(tail, 95)), 1)
    if econ:
        for rt in app.devices:
            if rt.economy is not None:
                result["detail"]["economy_shifts"] = rt.economy.shift_count
                result["detail"]["economy_final_rung"] = str(rt.economy.rung)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
