"""Native C++ ingest runtime vs pure-Python fallbacks: exact parity.

The .so auto-builds with make on first use; these tests are skipped only if
no toolchain exists (g++ is baked into the target environment)."""

import time

import numpy as np
import pytest

from rtlsdr_airband_tpu.native import native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib not built and no toolchain")


def test_ring_parity_random_ops():
    from rtlsdr_airband_tpu.inputs.base import RingBuffer
    from rtlsdr_airband_tpu.native import NativeRingBuffer

    rng = np.random.default_rng(0)
    py = RingBuffer(1024, extra=128)
    nat = NativeRingBuffer(1024, extra=128)
    for _ in range(500):
        if rng.random() < 0.55:
            n = int(rng.integers(1, 300))
            data = rng.integers(0, 256, n, dtype=np.uint8)
            assert py.append(data) == nat.append(data)
        else:
            n = int(rng.integers(1, 200))
            a, b = py.read(n), nat.read(n)
            if a is None or b is None:
                assert a is None and b is None
            else:
                np.testing.assert_array_equal(a, b)
        assert py.available() == nat.available()
    assert py.overflow_count == nat.overflow_count


@pytest.mark.parametrize("sfmt", ["u8", "s8", "s16", "f32"])
def test_convert_parity(sfmt):
    from rtlsdr_airband_tpu.native import convert_iq
    from rtlsdr_airband_tpu.ops.sampleconv import SampleFormat, decode_iq

    rng = np.random.default_rng(1)
    if sfmt == "u8":
        raw = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    elif sfmt == "s8":
        raw = rng.integers(-128, 128, 4096, dtype=np.int8).tobytes()
    elif sfmt == "s16":
        raw = rng.integers(-32768, 32768, 4096, dtype=np.int16).tobytes()
    else:
        raw = rng.normal(0, 0.3, 4096).astype(np.float32).tobytes()
    want = decode_iq(raw, SampleFormat(sfmt))
    got = convert_iq(raw, sfmt)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_native_file_reader_paced_eof(tmp_path):
    from rtlsdr_airband_tpu.native import NativeFileReader, NativeRingBuffer

    data = (np.arange(100_000) % 251).astype(np.uint8)
    p = tmp_path / "x.bin"
    data.tofile(p)
    ring = NativeRingBuffer(1 << 20)
    fr = NativeFileReader(str(p), ring, bytes_per_sec=5_120_000, speedup=0, chunk=8192)
    fr.start()
    got = []
    deadline = time.time() + 10
    while time.time() < deadline:
        n = ring.available()
        if n:
            got.append(ring.read(n))
        if fr.state == "FAILED" and ring.available() == 0:
            break
        time.sleep(0.001)
    fr.stop()
    all_got = np.concatenate(got)
    np.testing.assert_array_equal(all_got, data)
    assert fr.state == "FAILED"  # EOF semantics


def test_native_file_reader_missing(tmp_path):
    from rtlsdr_airband_tpu.native import NativeFileReader, NativeRingBuffer

    ring = NativeRingBuffer(4096)
    with pytest.raises(FileNotFoundError):
        NativeFileReader(str(tmp_path / "missing.bin"), ring, 1e6, 0)


def test_file_input_uses_native(tmp_path):
    from rtlsdr_airband_tpu.inputs.filesrc import FileInput
    from rtlsdr_airband_tpu.native import NativeRingBuffer

    p = tmp_path / "x.bin"
    np.zeros(10000, np.uint8).tofile(p)
    inp = FileInput(str(p), speedup_factor=0)
    assert isinstance(inp.ring, NativeRingBuffer)
    inp.init()
    assert inp._native is not None
    inp.start()
    deadline = time.time() + 5
    total = 0
    while time.time() < deadline:
        c = inp.read_bytes(min(4096, inp.available_bytes()) or 1)
        if c is not None:
            total += len(c)
        if total >= 10000:
            break
    inp.stop()
    assert total == 10000
