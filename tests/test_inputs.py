"""Input layer: ring buffer (tail duplication, overflow), file driver
(pacing, EOF->FAILED), driver registry."""

import time

import numpy as np
import pytest

from rtlsdr_airband_tpu.inputs.base import InputState, RingBuffer, input_new
from rtlsdr_airband_tpu.inputs.filesrc import FileInput


class TestRingBuffer:
    def test_basic_append_read(self):
        rb = RingBuffer(1000)
        assert rb.append(np.arange(100, dtype=np.uint8))
        assert rb.available() == 100
        out = rb.read(100)
        np.testing.assert_array_equal(out, np.arange(100, dtype=np.uint8))
        assert rb.available() == 0

    def test_overflow_counted_and_rejected(self):
        rb = RingBuffer(100)
        assert rb.append(np.zeros(80, np.uint8))
        assert not rb.append(np.zeros(30, np.uint8))
        assert rb.overflow_count == 1
        assert rb.available() == 80

    def test_wraparound_data_integrity(self):
        rb = RingBuffer(256)
        seq = np.arange(1024, dtype=np.int64) % 251
        w = 0
        r = 0
        got = []
        while r < 1024:
            if w < 1024:
                n = min(97, 1024 - w)
                if rb.append(seq[w : w + n].astype(np.uint8)):
                    w += n
            take = min(61, w - r)
            if take > 0:
                chunk = rb.read(take)
                if chunk is not None:
                    got.append(chunk)
                    r += take
        all_got = np.concatenate(got)
        np.testing.assert_array_equal(all_got, (seq % 251).astype(np.uint8))

    def test_tail_duplication_contiguous_reads(self):
        # reference: input-helpers.cpp:27-54 — a window-sized read crossing
        # the wrap point must come back contiguous and correct
        extra = 64
        rb = RingBuffer(256, extra=extra)
        data = np.arange(512, dtype=np.int64) % 256
        w = r = 0
        while r < 448:
            if w < 512:
                n = min(64, 512 - w)
                if rb.append(data[w : w + n].astype(np.uint8)):
                    w += n
            chunk = rb.read(min(48, w - r)) if w > r else None
            if chunk is not None:
                np.testing.assert_array_equal(chunk, (data[r : r + len(chunk)] % 256).astype(np.uint8))
                r += len(chunk)


class TestFileInput:
    def _mkfile(self, tmp_path, n=200_000):
        p = tmp_path / "iq.bin"
        data = (np.arange(n) % 251).astype(np.uint8)
        data.tofile(p)
        return str(p), data

    def test_reads_all_and_fails_at_eof(self, tmp_path):
        path, data = self._mkfile(tmp_path)
        inp = FileInput(path, sample_rate=2_560_000, speedup_factor=0)
        inp.init()
        inp.start()
        got = []
        deadline = time.time() + 10
        while time.time() < deadline:
            chunk = inp.read_bytes(4096)
            if chunk is not None:
                got.append(chunk)
            elif inp.state == InputState.FAILED and inp.available_bytes() < 4096:
                break
        tail = inp.read_bytes(inp.available_bytes()) if inp.available_bytes() else None
        if tail is not None:
            got.append(tail)
        inp.stop()
        all_got = np.concatenate(got)
        assert all_got.size == data.size
        np.testing.assert_array_equal(all_got, data)
        assert inp.state == InputState.FAILED  # EOF semantics (input-file.cpp:104-108)

    def test_missing_file_raises(self, tmp_path):
        inp = FileInput(str(tmp_path / "nope.bin"))
        with pytest.raises(FileNotFoundError):
            inp.init()
        assert inp.state == InputState.FAILED

    def test_pacing_roughly_matches_speedup(self, tmp_path):
        # 0.5 s of data at speedup 10 should take >= ~50 ms to deliver
        n = int(2_560_000 * 2 * 0.5)
        path, _ = self._mkfile(tmp_path, n=n)
        inp = FileInput(path, sample_rate=2_560_000, speedup_factor=10, buf_size=n + 1024)
        inp.init()
        t0 = time.time()
        inp.start()
        while inp.state == InputState.RUNNING and time.time() - t0 < 5:
            time.sleep(0.002)
        dt = time.time() - t0
        inp.stop()
        assert dt >= 0.04, f"file delivered too fast ({dt:.3f}s) — pacing not applied"


class TestRegistry:
    def test_file_driver_lookup(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"\x00" * 100)
        inp = input_new("file", filepath=str(p))
        assert isinstance(inp, FileInput)

    def test_unknown_type(self):
        with pytest.raises(ValueError, match="unknown input type"):
            input_new("carrier_pigeon")

    def test_hardware_drivers_importable_but_gated(self):
        # modules import cleanly without the hardware libs; init() raises
        from rtlsdr_airband_tpu.inputs.mirisdr import MiriSdrInput, mirisdr_available
        from rtlsdr_airband_tpu.inputs.rtlsdr import RtlSdrInput, rtlsdr_available

        if not rtlsdr_available():
            with pytest.raises(RuntimeError, match="librtlsdr"):
                RtlSdrInput().init()
        if not mirisdr_available():
            with pytest.raises(RuntimeError, match="libmirisdr"):
                MiriSdrInput().init()


class TestDriverConfigPassthrough:
    """Device-level driver options reach the drivers from a config FILE
    (reference: input-soapysdr.cpp:151-199, input-rtlsdr.cpp:215-221)."""

    def test_soapysdr_options_parse(self):
        from rtlsdr_airband_tpu.runtime.config import ConfigError, loads_config

        cfg = loads_config(
            'devices: ( { type = "soapysdr"; device_string = "driver=rtlsdr,serial=777"; '
            'antenna = "RX2"; channel = 1; gain = "LNA=30,VGA=20"; centerfreq = 120.0; '
            'sample_rate = 2560000; channels: ( { freq = 120.4; '
            'outputs: ( { type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 4000; } ); } ); } );'
        )
        d = cfg.devices[0]
        assert d.device_string == "driver=rtlsdr,serial=777"
        assert d.antenna == "RX2" and d.channel == 1
        assert d.gain == "LNA=30,VGA=20"  # per-element string passes through

        import pytest

        with pytest.raises(ConfigError, match="device_string"):
            loads_config(
                'devices: ( { type = "soapysdr"; centerfreq = 120.0; sample_rate = 2560000; '
                'channels: ( { freq = 120.4; outputs: ( { type = "udp_stream"; '
                'dest_address = "127.0.0.1"; dest_port = 4000; } ); } ); } );'
            )

    def test_rtlsdr_buffers_option(self):
        from rtlsdr_airband_tpu.runtime.config import loads_config

        cfg = loads_config(
            'devices: ( { type = "rtlsdr"; index = 0; buffers = 20; centerfreq = 120.0; '
            'sample_rate = 2560000; channels: ( { freq = 120.4; '
            'outputs: ( { type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 4001; } ); } ); } );'
        )
        assert cfg.devices[0].buffers == 20

    def test_mirisdr_num_buffers_option(self, monkeypatch, tmp_path):
        """reference: input-mirisdr.cpp:200-206 — num_buffers sizes the
        libusb buffer pool (320 kB each); <1 is a config error."""
        import pytest as _pytest

        from rtlsdr_airband_tpu import app as app_mod
        from rtlsdr_airband_tpu.inputs.filesrc import FileInput
        from rtlsdr_airband_tpu.runtime.config import ConfigError, loads_config

        base = (
            'devices: ( {{ type = "mirisdr"; index = 0; num_buffers = {n}; gain = 28.0; '
            'centerfreq = 120.0; sample_rate = 2560000; channels: ( {{ freq = 120.4; '
            'outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 4005; }} ); }} ); }} );'
        )
        cfg = loads_config(base.format(n=16))
        assert cfg.devices[0].num_buffers == 16
        with _pytest.raises(ConfigError, match="num_buffers"):
            loads_config(base.format(n=0))

        calls = []
        iq = tmp_path / "dummy2.cu8"
        iq.write_bytes(b"\x80" * 4096)

        def fake_input_new(typ, **kw):
            calls.append((typ, kw))
            return FileInput(filepath=str(iq), sample_rate=kw["sample_rate"], centerfreq=kw["centerfreq"])

        monkeypatch.setattr(app_mod, "input_new", fake_input_new)
        app_mod.App(cfg)
        (t0, kw0), = calls
        assert t0 == "mirisdr" and kw0["buf_size"] == 16 * 320_000

    def test_app_passes_driver_kwargs(self, monkeypatch, tmp_path):
        """App._build_device forwards the parsed driver options to
        input_new (the reference plumbs them via parse_config vtable)."""
        from rtlsdr_airband_tpu import app as app_mod
        from rtlsdr_airband_tpu.inputs.filesrc import FileInput
        from rtlsdr_airband_tpu.runtime.config import loads_config

        calls = []
        iq = tmp_path / "dummy.cu8"
        iq.write_bytes(b"\x80" * 4096)

        def fake_input_new(typ, **kw):
            calls.append((typ, kw))
            return FileInput(filepath=str(iq), sample_rate=kw["sample_rate"], centerfreq=kw["centerfreq"])

        monkeypatch.setattr(app_mod, "input_new", fake_input_new)
        cfg = loads_config(
            'devices: ( { type = "soapysdr"; device_string = "driver=sdrplay"; antenna = "A"; '
            'channel = 2; centerfreq = 120.0; sample_rate = 2560000; channels: ( { freq = 120.4; '
            'outputs: ( { type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 4002; } ); } ); }, '
            '{ type = "rtlsdr"; index = 1; buffers = 20; gain = 28.0; centerfreq = 120.0; '
            'sample_rate = 2560000; channels: ( { freq = 120.4; '
            'outputs: ( { type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = 4003; } ); } ); } );'
        )
        app_mod.App(cfg)
        (t0, kw0), (t1, kw1) = calls
        assert t0 == "soapysdr"
        assert kw0["device_string"] == "driver=sdrplay" and kw0["antenna"] == "A" and kw0["channel"] == 2
        assert kw0["agc"] is True  # gain omitted -> hardware AGC (reference rule)
        assert t1 == "rtlsdr" and kw1["index"] == 1
        from rtlsdr_airband_tpu.inputs.rtlsdr import DEFAULT_BUFLEN

        assert kw1["buf_size"] == 20 * DEFAULT_BUFLEN
        assert kw1["gain"] == 28.0
