#!/usr/bin/env python
"""Unattended-daemon soak: run the production App for a long stretch on a
looped file input and record process-health samples (RSS, thread count, open
fds, block cadence, counters) — daemon-grade operation evidence for the
reference's service contract (/root/reference/init.d/rtl_airband.service:
a process expected to run for weeks).

    SOAK_MINUTES=30 SOAK_CHANNELS=2048 python scripts/soak.py [--out SOAK.json]

The input is a file device with speedup_factor = 1 (real-time pacing); at
EOF the input FAILS (reference semantics, input-file.cpp:104-108), so the
soak loops the recording by pointing the driver at a FIFO fed continuously
by a writer thread — the input thread never sees EOF.

Pass criteria (asserted, exit 1 on violation):
 - RSS growth from the 10%-mark to the end < SOAK_RSS_SLACK_MB (default 64)
 - thread and fd counts flat from the 10%-mark to the end (+/-2)
 - block cadence held: total handled blocks >= 97% of real-time expectation
 - stats file kept being rewritten at its 15 s cadence
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def proc_health():
    """(rss_mb, n_threads, n_fds) from /proc/self (linux)."""
    rss_kb = 0
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                rss_kb = int(line.split()[1])
            elif line.startswith("Threads:"):
                threads = int(line.split()[1])
    return rss_kb / 1024.0, threads, len(os.listdir("/proc/self/fd"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "SOAK.json"))
    args = ap.parse_args()

    minutes = float(os.environ.get("SOAK_MINUTES", "30"))
    n_channels = int(os.environ.get("SOAK_CHANNELS", "2048"))
    chunk = int(os.environ.get("SOAK_BLOCKS_PER_DISPATCH", "16"))
    slots = int(os.environ.get("SOAK_ACTIVE_SLOTS", "192"))
    fmt = os.environ.get("SOAK_FMT", "i16")
    rss_slack_mb = float(os.environ.get("SOAK_RSS_SLACK_MB", "64"))
    if os.environ.get("SOAK_CPU", "0") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from bench_app import build_scene  # same scene machinery as the bench
    from rtlsdr_airband_tpu.app import App
    from rtlsdr_airband_tpu.models.flagship import flagship_specs
    from rtlsdr_airband_tpu.ops.levels import level_to_dbfs
    from rtlsdr_airband_tpu.runtime.config import load_config

    center, fs, wave_rate = 120_000_000, 2_560_000, 16000
    specs = flagship_specs(n_channels, center, fs)
    freqs = [s.frequency for s in specs]
    n_hot = max(2, round(62.0 * 0.06))  # ~6% open fraction scene family
    import numpy as np

    hot = [int(i) for i in np.linspace(0, n_channels - 1, n_hot).astype(int)]

    # a ~30 s recording looped through a FIFO forever
    from rtlsdr_airband_tpu.constants import AGC_EXTRA

    hop, W = fs // wave_rate, wave_rate // 8
    total = AGC_EXTRA * hop + 240 * W * hop + 512
    tmp = tempfile.mkdtemp(prefix="soak_")
    scene_path = os.path.join(tmp, "scene.cu8")
    build_scene(scene_path, freqs, hot, center, fs, total, wave_rate)
    scene = open(scene_path, "rb").read()

    fifo = os.path.join(tmp, "stream.fifo")
    os.mkfifo(fifo)
    stop_feed = threading.Event()

    def feeder():
        # blocking open until the reader connects; loop the scene forever
        with open(fifo, "wb") as f:
            while not stop_feed.is_set():
                try:
                    f.write(scene)
                except BrokenPipeError:
                    return

    tf = threading.Thread(target=feeder, daemon=True, name="soak-feeder")
    tf.start()

    thr_dbfs = round(float(level_to_dbfs(1.0, 512)), 1)
    stats_path = os.path.join(tmp, "stats.txt")
    chans = ", ".join(
        f'{{ freq = {f}; modulation = "am"; squelch_threshold = {thr_dbfs}; '
        f'outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = {21000 + (i % 8000)}; }} ); }}'
        for i, f in enumerate(freqs)
    )
    econ = os.environ.get("SOAK_ECON", "0") == "1"
    cfg_text = (
        f'fft_size = 512;\nwave_rate = {wave_rate};\nstats_filepath = "{stats_path}";\n'
        f'blocks_per_dispatch = {chunk};\nactive_fetch_slots = {slots};\n'
        f'fetch_audio_fmt = "{fmt}";\nsuppress_fade_tails = true;\nfetch_meta_per_chunk = true;\n'
        + ('fetch_economy = "auto";\n' if econ else "")
        + f'devices: ( {{ type = "file"; filepath = "{fifo}"; centerfreq = {center}; '
        f'sample_rate = {fs}; sample_format = "u8"; speedup_factor = 1.0; '
        f'channels: ( {chans} ); }} );\n'
    )
    cfg_path = os.path.join(tmp, "soak.conf")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    app = App(load_config(cfg_path))
    t0 = time.perf_counter()
    for rt in app.devices:
        rt.pipeline.warm(chunk)
    t_compile = time.perf_counter() - t0
    print(f"[soak] warm/compile {t_compile:.1f}s; running {minutes:.0f} min", file=sys.stderr, flush=True)

    blocks = [0]
    orig = app._handle_block

    def counting(rt, out):
        orig(rt, out)
        blocks[0] += 1

    app._handle_block = counting

    samples = []
    stats_mtimes = set()

    def sampler():
        import jax

        while not app.do_exit:
            rss, thr, fds = proc_health()
            samples.append(
                dict(t=round(time.perf_counter() - t0, 1), rss_mb=round(rss, 1), threads=thr, fds=fds,
                     blocks=blocks[0],
                     overflow=int(sum(rt.pipeline.gather_overflow_count for rt in app.devices)),
                     ring_overflow=int(sum(rt.input.ring.overflow_count for rt in app.devices)),
                     live_arrays=len(jax.live_arrays()))
            )
            if os.path.exists(stats_path):
                stats_mtimes.add(round(os.path.getmtime(stats_path)))
            print(f"[soak] {samples[-1]}", file=sys.stderr, flush=True)
            time.sleep(15.0)

    ts = threading.Thread(target=sampler, daemon=True, name="soak-sampler")

    t0 = time.perf_counter()
    ts.start()
    app.run(max_seconds=minutes * 60.0)
    stop_feed.set()
    wall = time.perf_counter() - t0

    # analysis: compare the 10%-mark sample to the last
    i10 = max(1, len(samples) // 10)
    base, last = samples[i10], samples[-1]
    rss_growth = last["rss_mb"] - base["rss_mb"]
    thread_drift = last["threads"] - base["threads"]
    fd_drift = last["fds"] - base["fds"]
    # real-time expectation minus startup fill (prime + first chunk) and the
    # final partial chunk still in flight at the cutoff
    expected_blocks = (wall - 5.0) / 0.125 - 2 * chunk
    cadence_ok = blocks[0] >= expected_blocks * 0.97
    checks = {
        "rss_flat": bool(rss_growth < rss_slack_mb),
        "threads_flat": bool(abs(thread_drift) <= 2),
        "fds_flat": bool(abs(fd_drift) <= 2),
        "cadence_held": bool(cadence_ok),
        "stats_cadence": bool(len(stats_mtimes) >= (wall / 15.0) * 0.8),
    }
    out = {
        "metric": "soak",
        "minutes": round(wall / 60.0, 1),
        "platform": __import__("jax").devices()[0].platform,
        "n_channels": n_channels,
        "blocks_handled": blocks[0],
        "rss_mb_start": base["rss_mb"],
        "rss_mb_end": last["rss_mb"],
        "rss_growth_mb": round(rss_growth, 1),
        "thread_drift": thread_drift,
        "fd_drift": fd_drift,
        "gather_overflow_total": last["overflow"],
        "ring_overflow_total": last["ring_overflow"],
        "stats_rewrites": len(stats_mtimes),
        "checks": checks,
        "pass": bool(all(checks.values())),
        "samples": samples[:: max(1, len(samples) // 40)],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "samples"}))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
