"""App integration on the CPU backend: config -> file input -> pipeline ->
outputs, including scan mode and mixers.  (The conftest pins jax to an
8-device virtual CPU mesh; the TPU path is exercised by bench/driver.)"""

import os
import time

import numpy as np
import pytest

from rtlsdr_airband_tpu.app import App
from rtlsdr_airband_tpu.runtime.config import loads_config
from rtlsdr_airband_tpu.utils.siggen import am_carrier_iq, complex_noise

FS = 2_560_000


def write_iq(path, secs=2.0, freq_off=400_000, wr=8000, tone=800.0, gate=None):
    n = int(FS * secs)
    audio = (0.9 * np.sin(2 * np.pi * tone * np.arange(int(wr * secs)) / wr)).astype(np.float32)
    iq = am_carrier_iq(FS, freq_off, n, audio=audio, carrier_ampl=0.4, mod_index=0.8, audio_rate=wr)
    if gate is not None:
        g = np.zeros(n, np.float32)
        g[int(n * gate[0]) : int(n * gate[1])] = 1.0
        iq = iq * g
    iq = iq + complex_noise(n, 0.005, seed=7)
    u8 = np.empty(2 * n, np.uint8)
    u8[0::2] = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    u8[1::2] = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    u8.tofile(path)


def run_app(cfg_text, max_wall=90):
    cfg = loads_config(cfg_text)
    app = App(cfg)
    app.start()
    t0 = time.time()
    try:
        while time.time() - t0 < max_wall:
            w = app._service_once()
            if not any(rt.alive for rt in app.devices):
                break
            if not w:
                time.sleep(0.002)
    finally:
        app.stop()
    return app


def test_end_to_end_file_to_wav(tmp_path):
    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=2.0)
    out = tmp_path / "out"
    cfg = f'''
fft_size = 512;
stats_filepath = "{tmp_path}/stats.txt";
devices: ({{
  type = "file"; filepath = "{iq}"; sample_format = "u8";
  sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0;
  channels: ({{
    freq = 120.4;
    outputs: ( {{ type = "file"; directory = "{out}"; filename_template = "twr"; }} );
  }});
}});
'''
    app = run_app(cfg)
    rt = app.devices[0]
    assert rt.pipeline.blocks_processed >= 10
    files = os.listdir(out)
    assert len(files) == 1 and files[0].endswith((".mp3", ".wav"))
    assert os.path.getsize(out / files[0]) > 1000
    # stats were written with real levels
    text = open(tmp_path / "stats.txt").read()
    assert "channel_activity_counter" in text
    line = [l for l in text.splitlines() if l.startswith('channel_activity_counter{freq="120.400"}')][0]
    assert int(line.split("\t")[1]) > 0


def test_scan_mode_hops(tmp_path):
    # signal only at the second scan frequency; device must hop to it
    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=4.0, freq_off=0)  # carrier exactly at scanned freq
    out = tmp_path / "outs"
    cfg = f'''
fft_size = 512;
devices: ({{
  type = "file"; filepath = "{iq}"; sample_format = "u8";
  sample_rate = 2560000; centerfreq = 121.5; mode = "scan"; speedup_factor = 0.0;
  channels: ({{
    freqs = ( 118.0, 121.5 );
    outputs: ( {{ type = "file"; directory = "{out}"; filename_template = "scan"; include_freq = true; }} );
  }});
}});
'''
    cfg_obj = loads_config(cfg)
    app = App(cfg_obj)
    # drive the scan clock manually: controller checks are 200 ms apart
    sc = app.devices[0].scan
    assert sc is not None
    base_t = [time.time()]
    sc._clock = lambda: base_t[0]
    app.start()
    t0 = time.time()
    try:
        while time.time() - t0 < 120:
            base_t[0] += 0.25  # fake 250 ms per service tick
            app._service_once()
            if sc.st.freq_idx == 1 and app.devices[0].pipeline.blocks_processed > 2:
                break
            if not any(rt.alive for rt in app.devices):
                break
    finally:
        app.stop()
    assert sc.st.freq_idx == 1, "scan never hopped to the active frequency"
    # after the hop the pipeline is tuned so the carrier is in-band
    ch0 = app.devices[0].channels[0]
    assert ch0.freq_idx == 1


def test_mixer_end_to_end(tmp_path):
    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=1.5)
    out = tmp_path / "outm"
    cfg = f'''
fft_size = 512;
mixers: {{
  mx: {{ outputs: ( {{ type = "file"; directory = "{out}"; filename_template = "mixed"; continuous = true; }} ); }};
}};
devices: ({{
  type = "file"; filepath = "{iq}"; sample_format = "u8";
  sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0;
  channels: ({{
    freq = 120.4;
    outputs: ( {{ type = "mixer"; name = "mx"; }} );
  }});
}});
'''
    app = run_app(cfg)
    files = os.listdir(out)
    assert len(files) == 1
    assert os.path.getsize(out / files[0]) > 500


def test_udp_output_streams(tmp_path):
    import socket

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.setblocking(False)
    port = rx.getsockname()[1]
    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=1.5)
    cfg = f'''
fft_size = 512;
devices: ({{
  type = "file"; filepath = "{iq}"; sample_format = "u8";
  sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0;
  channels: ({{
    freq = 120.4;
    outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = {port}; }} );
  }});
}});
'''
    run_app(cfg)
    chunks = []
    try:
        while True:
            data, _ = rx.recvfrom(65536)
            chunks.append(data)
    except BlockingIOError:
        pass
    rx.close()
    assert chunks, "no UDP audio received"
    audio = np.frombuffer(b"".join(chunks), np.float32)
    # 800 Hz tone must dominate
    seg = audio[: 4096] * np.hanning(min(4096, audio.size))
    freqs = np.fft.rfftfreq(seg.size, 1 / 8000)
    peak = freqs[np.argmax(np.abs(np.fft.rfft(seg))[5:]) + 5]
    assert abs(peak - 800) < 25


def test_tui_renders_status_grid(tmp_path, capsys):
    """TUI waterfall analog: per-channel signal/noise dBFS + state glyph,
    including '~' = signal outside filter (reference: rtl_airband.cpp:632-643,
    1033-1048; squelch.cpp:152-154)."""
    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=1.0)
    cfg = f'''
fft_size = 512;
stats_filepath = "{tmp_path}/stats.txt";
devices: ({{
  type = "file"; filepath = "{iq}"; sample_format = "u8";
  sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0;
  channels: (
    {{ freq = 120.4; label = "TWR";
       outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 57311; }} ); }},
    {{ freq = 119.1; label = "GND";
       outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 57312; }} ); }},
    {{ freq = 120.398; label = "OFF"; bandwidth = 2000;
       outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 57313; }} ); }}
  );
}});
'''
    app = run_app(cfg)
    capsys.readouterr()  # drop any prior output
    app._draw_tui()
    out = capsys.readouterr().out
    assert "rtlsdr-airband-tpu" in out
    assert "device 0 [file] center=120.000 MHz" in out
    assert " 120.4000 MHz" in out and " 119.1000 MHz" in out
    assert "TWR" in out and "GND" in out
    assert out.count("dBFS") == 6  # sig + noise per channel
    # active channel (120.4 carries a carrier) shows the open glyph '*',
    # and its signal level sits well above its noise floor
    twr = [l for l in out.splitlines() if "TWR" in l][0]
    assert "[*]" in twr
    sig = float(twr.split("sig")[1].split("dBFS")[0])
    noise = float(twr.split("noise")[1].split("dBFS")[0])
    assert sig > noise + 6
    # the OFF channel shares the carrier's FFT bin but its 1 kHz Bessel
    # lowpass rejects the 2 kHz-offset carrier: signal present pre-filter,
    # absent post-filter -> '~'
    off = [l for l in out.splitlines() if "OFF" in l][0]
    assert "[~]" in off
    # squelch_level gauge is populated with real (nonzero) levels
    app.stats_writer.write([rt.stats for rt in app.devices])
    text = open(tmp_path / "stats.txt").read()
    lvl_lines = [l for l in text.splitlines() if l.startswith("channel_squelch_level{")]
    assert len(lvl_lines) == 3
    assert all(float(l.split("\t")[1]) > 0 for l in lvl_lines)


def test_buffer_overflow_count_reaches_stats(tmp_path):
    """Ring overflow -> DeviceStats.buffer_overflow_count -> stats file
    (reference: input-helpers.cpp:56-61, output.cpp:787-800)."""
    import numpy as np

    from rtlsdr_airband_tpu.inputs.base import RingBuffer

    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=0.5)
    cfg = f'''
fft_size = 512;
stats_filepath = "{tmp_path}/stats.txt";
devices: ({{
  type = "file"; filepath = "{iq}"; sample_format = "u8";
  sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0;
  channels: ({{ freq = 120.4;
    outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 57314; }} ); }});
}});
'''
    app = App(loads_config(cfg))
    rt = app.devices[0]
    # force an overflow: tiny ring, oversize append
    rt.input.ring = RingBuffer(1024)
    assert not rt.input.ring.append(np.zeros(2048, np.uint8))
    app._service_once()
    assert rt.stats.buffer_overflow_count == 1
    app.stats_writer.write([d.stats for d in app.devices])
    text = open(tmp_path / "stats.txt").read()
    assert 'buffer_overflow_count{device="0"}\t1' in text


def test_multiple_output_threads_isolate_slow_sink(tmp_path):
    """With multiple_output_threads, a blocked sink on one device must not
    stall any device's block cadence; the dropped blocks are counted as
    device output overruns (reference: rtl_airband.cpp:817-819, 1056-1090,
    overrun counting :649-655)."""
    import threading

    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=2.0)
    dev = f'''{{
  type = "file"; filepath = "{iq}"; sample_format = "u8";
  sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0;
  channels: ({{ freq = 120.4;
    outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 57315; }} ); }});
}}'''
    cfg = f"fft_size = 512;\nmultiple_output_threads = true;\ndevices: ({dev}, {dev});\n"
    app = App(loads_config(cfg))
    assert all(rt.sink_worker is not None for rt in app.devices)

    blocked = threading.Event()
    release = threading.Event()

    def slow_process(audio, **kw):
        blocked.set()
        release.wait(timeout=60)

    app.devices[0].channels[0].outputs.process = slow_process
    app.start()
    t0 = time.time()
    try:
        while time.time() - t0 < 90:
            app._service_once()
            if min(rt.pipeline.blocks_processed for rt in app.devices) >= 8:
                break
            if not any(rt.alive for rt in app.devices):
                break
    finally:
        release.set()
        app.stop()
    # both devices kept producing blocks while device 0's sink was stuck
    assert app.devices[0].pipeline.blocks_processed >= 8
    assert app.devices[1].pipeline.blocks_processed >= 8
    assert blocked.is_set()
    # device 0's worker queue overflowed -> output overruns counted
    assert app.devices[0].stats.output_overrun_count > 0
    assert app.devices[1].stats.output_overrun_count == 0


def test_multiple_demod_threads_per_device_workers(tmp_path):
    """multiple_demod_threads spawns one demod worker per device
    (reference: rtl_airband.cpp:809-816, 1052-1090): both devices' streams
    demodulate concurrently and produce audio identical to the
    single-threaded loop."""
    import threading

    iq0, iq1 = tmp_path / "iq0.bin", tmp_path / "iq1.bin"
    write_iq(str(iq0), secs=1.5, tone=700.0)
    write_iq(str(iq1), secs=1.5, tone=1300.0)

    def cfg_text(mdt):
        devs = ", ".join(
            f'''{{ type = "file"; filepath = "{p}"; sample_format = "u8";
  sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0;
  channels: ({{ freq = 120.4;
    outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = {port}; }} ); }}); }}'''
            for p, port in ((iq0, 57411), (iq1, 57412))
        )
        return f"fft_size = 512;\nmultiple_demod_threads = {mdt};\ndevices: ({devs});\n"

    def collect(mdt):
        app = App(loads_config(cfg_text(mdt)))
        lock = threading.Lock()
        blocks = {0: [], 1: []}
        threads: set = set()
        orig = app._handle_block

        def record(rt, out):
            with lock:
                threads.add(threading.current_thread().name)
                blocks[rt.stats.index].append(np.asarray(out["audio"]).copy())
            orig(rt, out)

        app._handle_block = record
        app.run(max_seconds=90.0)
        return app, blocks, threads

    app_st, single, threads_st = collect("false")
    assert all(not t.startswith("demod-") for t in threads_st)
    app_mt, multi, threads_mt = collect("true")
    # blocks really were produced by the per-device worker threads
    assert {t for t in threads_mt if t.startswith("demod-")} == {"demod-0", "demod-1"}
    for di in (0, 1):
        assert len(multi[di]) == len(single[di]) and len(single[di]) >= 8, (di, len(multi[di]), len(single[di]))
        for k, (a, b) in enumerate(zip(single[di], multi[di])):
            np.testing.assert_array_equal(a, b, err_msg=f"device {di} block {k}")


def test_fast_path_matches_slow_path(tmp_path):
    """The vectorized O(open) block handler must be observably identical to
    the naive per-channel loop for control-free devices: same UDP audio
    stream, same mixer output, same final stats file."""
    import socket

    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=1.5, gate=(0.2, 0.75))  # squelch opens AND closes

    def build_cfg(port, stats_path, outdir):
        return f'''
fft_size = 512;
stats_filepath = "{stats_path}";
mixers: {{ mx: {{ outputs: ( {{ type = "file"; directory = "{outdir}"; filename_template = "mix"; continuous = true; }} ); }} }};
devices: ({{
  type = "file"; filepath = "{iq}"; sample_format = "u8";
  sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0;
  channels: (
    {{ freq = 120.4;
       outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = {port}; }},
                  {{ type = "rawfile"; directory = "{outdir}"; filename_template = "iq0"; continuous = true; }},
                  {{ type = "mixer"; name = "mx"; }} ); }},
    {{ freq = 120.7;
       outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = {port + 1}; }} ); }}
  );
}});
'''

    def run_once(force_slow):
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4 << 20)
        sock.bind(("127.0.0.1", 0))
        sock.settimeout(0.2)
        port = sock.getsockname()[1]
        outdir = tmp_path / ("slow" if force_slow else "fast")
        stats_path = tmp_path / ("stats_slow.txt" if force_slow else "stats_fast.txt")
        app = App(loads_config(build_cfg(port, stats_path, outdir)))
        if force_slow:
            for rt in app.devices:
                rt.fast_path = False
        else:
            assert app.devices[0].fast_path  # no scan/AFC -> fast path on
            # the mixer-fed channel must be in the idle-tick set
            assert 0 in app.devices[0].idle_tick_idx.tolist()
        app.run(max_seconds=90.0)
        chunks = []
        try:
            while True:
                chunks.append(sock.recvfrom(65536)[0])
        except socket.timeout:
            pass
        sock.close()
        audio = np.frombuffer(b"".join(chunks), np.float32)
        # ring-overflow count is timing-dependent (unpaced file input floods
        # the ring during the first compile) — not part of the equivalence
        stats = "\n".join(l for l in open(stats_path).read().splitlines() if not l.startswith("buffer_overflow_count{"))
        files = sorted((outdir).iterdir()) if outdir.exists() else []
        mix_bytes = b"".join(f.read_bytes() for f in files if f.name.startswith("mix"))
        iq_bytes = b"".join(f.read_bytes() for f in files if f.name.startswith("iq0"))
        return audio, stats, mix_bytes, iq_bytes

    fast_audio, fast_stats, fast_mix, fast_iq = run_once(force_slow=False)
    slow_audio, slow_stats, slow_mix, slow_iq = run_once(force_slow=True)

    assert len(fast_audio) == len(slow_audio) and len(fast_audio) > 4000
    np.testing.assert_array_equal(fast_audio, slow_audio)
    assert fast_stats == slow_stats
    assert len(fast_mix) == len(slow_mix) > 1000
    assert fast_mix == slow_mix
    # the continuous IQ file must contain every block — including
    # closed-squelch silence blocks written by the fast path's idle tick
    # (round-4 advisory: the fast path skipped iq_files while closed)
    assert len(fast_iq) == len(slow_iq) > 1000
    assert fast_iq == slow_iq


def test_startup_gate_aborts_on_dead_device(tmp_path, monkeypatch):
    """reference: rtl_airband.cpp:1024-1032 — wait up to 5 s for every
    input to come up, fatal when one never does."""
    import pytest as _pytest

    from rtlsdr_airband_tpu import app as app_mod
    from rtlsdr_airband_tpu.inputs.base import InputState
    from rtlsdr_airband_tpu.inputs.filesrc import FileInput

    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=0.5)

    class StuckInput(FileInput):
        def start(self):  # rx thread never launches -> state stays INITIALIZED
            pass

    def fake_input_new(typ, **kw):
        return StuckInput(filepath=str(iq), sample_rate=kw["sample_rate"], centerfreq=kw["centerfreq"])

    monkeypatch.setattr(app_mod, "input_new", fake_input_new)
    cfg = loads_config(
        f'devices: ( {{ type = "file"; filepath = "{iq}"; sample_format = "u8"; '
        'sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0; '
        'channels: ( { freq = 120.4; outputs: ( { type = "udp_stream"; '
        'dest_address = "127.0.0.1"; dest_port = 4100; } ); } ); } );'
    )
    app = app_mod.App(cfg)
    assert app.devices[0].input.state == InputState.UNKNOWN
    with _pytest.raises(RuntimeError, match="failed to initialize"):
        app.start(gate_timeout=0.3)


def test_startup_gate_hw_failure_is_fatal_immediately(tmp_path, monkeypatch):
    """A hardware device whose rx thread FAILS inside the gate window aborts
    at once (reference: count_devices_running counts only INPUT_RUNNING,
    rtl_airband.cpp:1024-1032) — FAILED must not count as 'came up' for
    non-file devices (round-4 advisory).  File inputs keep the EOF->FAILED
    completion exemption (input-file.cpp:104-108)."""
    import time as _time

    import pytest as _pytest

    from rtlsdr_airband_tpu import app as app_mod
    from rtlsdr_airband_tpu.inputs.base import InputState
    from rtlsdr_airband_tpu.inputs.filesrc import FileInput

    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=0.5)

    class FailingInput(FileInput):
        def start(self):  # rx thread dies instantly -> FAILED
            self.state = InputState.FAILED

    def fake_input_new(typ, **kw):
        assert typ == "rtlsdr"
        return FailingInput(filepath=str(iq), sample_rate=kw["sample_rate"], centerfreq=kw["centerfreq"])

    monkeypatch.setattr(app_mod, "input_new", fake_input_new)
    cfg = loads_config(
        'devices: ( { type = "rtlsdr"; index = 0; gain = 25.4; '
        'sample_rate = 2560000; centerfreq = 120.0; '
        'channels: ( { freq = 120.4; outputs: ( { type = "udp_stream"; '
        'dest_address = "127.0.0.1"; dest_port = 4101; } ); } ); } );'
    )
    app = app_mod.App(cfg)
    t0 = _time.monotonic()
    with _pytest.raises(RuntimeError, match="failed to initialize"):
        app.start(gate_timeout=30.0)
    # fatal immediately, not after the 30 s window
    assert _time.monotonic() - t0 < 5.0
