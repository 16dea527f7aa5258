"""Big-mixer scenario (BASELINE.json configs[4]): many channels across two
virtual (file) devices all feeding one mixer, plus a stereo pair with
balance.  Mirrors the reference's big_mixer.conf shape."""

import os
import time

import numpy as np

from rtlsdr_airband_tpu.app import App
from rtlsdr_airband_tpu.runtime.config import loads_config
from rtlsdr_airband_tpu.utils.siggen import am_carrier_iq, complex_noise

FS = 2_560_000


def write_multi_iq(path, offsets_hz, secs=1.5, wr=8000):
    n = int(FS * secs)
    iq = complex_noise(n, 0.004, seed=11)
    for k, off in enumerate(offsets_hz):
        audio = (0.8 * np.sin(2 * np.pi * (500.0 + 90 * k) * np.arange(int(wr * secs)) / wr)).astype(np.float32)
        iq = iq + am_carrier_iq(FS, off, n, audio=audio, carrier_ampl=0.35, mod_index=0.8, audio_rate=wr)
    u8 = np.empty(2 * n, np.uint8)
    u8[0::2] = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    u8[1::2] = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    u8.tofile(path)


def test_big_mixer_two_devices(tmp_path):
    n_per_dev = 6
    offs_a = [(-800_000 + 260_000 * i) for i in range(n_per_dev)]
    offs_b = [(-700_000 + 240_000 * i) for i in range(n_per_dev)]
    iq_a, iq_b = tmp_path / "a.bin", tmp_path / "b.bin"
    write_multi_iq(str(iq_a), offs_a)
    write_multi_iq(str(iq_b), offs_b)
    out = tmp_path / "out"

    def chans(offs, center_mhz, mixer, bal=None):
        rows = []
        for i, off in enumerate(offs):
            f = center_mhz + off / 1e6
            extra = f" balance = {bal[i % len(bal)]};" if bal else ""
            rows.append(f'{{ freq = {f:.6f}; outputs: ( {{ type = "mixer"; name = "{mixer}"; ampfactor = 0.4;{extra} }} ); }}')
        return ",\n    ".join(rows)

    cfg = f'''
fft_size = 512;
mixers: {{
  big: {{ outputs: ( {{ type = "file"; directory = "{out}"; filename_template = "big"; continuous = true; }} ); }};
  pair: {{ outputs: ( {{ type = "file"; directory = "{out}"; filename_template = "pair"; continuous = true; }} ); }};
}};
devices: (
  {{
    type = "file"; filepath = "{iq_a}"; sample_format = "u8";
    sample_rate = 2560000; centerfreq = 119.0; speedup_factor = 0.0;
    channels: (
    {chans(offs_a, 119.0, "big")},
    {chans(offs_a[:2], 119.0, "pair", bal=[-0.9, 0.9])}
    );
  }},
  {{
    type = "file"; filepath = "{iq_b}"; sample_format = "u8";
    sample_rate = 2560000; centerfreq = 126.0; speedup_factor = 0.0;
    channels: (
    {chans(offs_b, 126.0, "big")}
    );
  }}
);
'''
    config = loads_config(cfg)
    assert len(config.devices) == 2
    app = App(config)
    assert sum(len(rt.channels) for rt in app.devices) == 2 * n_per_dev + 2
    app.start()
    t0 = time.time()
    try:
        while time.time() - t0 < 150:
            w = app._service_once()
            if not any(rt.alive for rt in app.devices):
                break
            if not w:
                time.sleep(0.002)
    finally:
        app.stop()

    for rt in app.devices:
        assert rt.pipeline.blocks_processed >= 8

    files = sorted(os.listdir(out))
    big = [f for f in files if f.startswith("big")]
    pair = [f for f in files if f.startswith("pair")]
    assert big and pair
    assert os.path.getsize(out / big[0]) > 2000
    # the stereo pair mixer switched to stereo (nonzero balance on its inputs)
    assert app.mixers["pair"].stereo
    # mixer audio actually carried signal: decode-agnostic size check + input
    # connection bookkeeping
    assert len(app.mixers["big"].inputs) == 2 * n_per_dev
