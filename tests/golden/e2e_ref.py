"""End-to-end golden harness vs the ACTUAL reference binary.

Builds the unmodified reference rtl_airband (tests/golden/refbuild/), runs it
on a synthetic u8 IQ recording with a file input and per-channel
udp_stream outputs (continuous mode — raw float32 audio every batch,
reference: src/output.cpp:536-547), captures the audio over loopback UDP,
runs the TPU pipeline on the same bytes, aligns the streams and computes
per-channel SNR and squelch-gating agreement.

This is the top link of the parity chain (reference C++ binary <-> TPU
pipeline); the measured bounds live in E2E_GOLDEN.md.
"""

from __future__ import annotations

import os
import socket
import subprocess
import threading
from dataclasses import dataclass, field

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

SAMPLE_RATE = 1_024_000
CENTER = 120_000_000
WAVE_RATE = 16_000  # refbuild has NFM on -> WAVE_RATE 16000 (rtl_airband.h:67-71)
WAVE_BATCH = WAVE_RATE // 8
FFT_SIZE = 512
DURATION_S = 5.0


@dataclass
class E2EChannel:
    name: str
    freq: int  # absolute Hz (the CONFIGURED channel frequency)
    modulation: str  # 'am' | 'nfm'
    key: tuple[float, float]  # carrier-on interval (s)
    tone_hz: float  # voice tone
    ctcss: float = 0.0
    bandwidth: float = 0.0
    notch: float = 0.0
    ampfactor: float = 1.0
    snr_threshold_db: float | None = None
    extra_conf: str = ""
    ctcss_ampl: float = 0.18  # CTCSS tone amplitude in the audio mix
    afc: int = 0  # AFC threshold divisor (reference: channel afc option)
    carrier_offset_hz: float = 0.0  # transmit offset from the configured freq


# Channel plan (fs/N = 2000 Hz/bin): AM exactly on a bin; NFM 0.2 bins
# off-center to exercise the fixed-point derotator (dm_dphi, reference:
# config.cpp:679-712); a bandwidth-limited AM channel (Bessel lowpass +
# squelch pre/post-filter compare, reference: rtl_airband.cpp:510-529);
# a CTCSS-gated NFM channel with a notch on the tone (reference:
# squelch.cpp:110-134, filters.cpp:30-64).
CHANNELS = [
    E2EChannel("am", CENTER + 40_000, "am", (0.5, 2.5), 400.0),
    E2EChannel("nfm", CENTER + 100_400, "nfm", (1.0, 4.0), 700.0),
    E2EChannel("am_bw", CENTER - 60_000, "am", (0.8, 3.2), 520.0, bandwidth=6000.0, ampfactor=1.5, snr_threshold_db=12.0),
    E2EChannel("nfm_ctcss", CENTER - 150_600, "nfm", (1.5, 4.5), 650.0, ctcss=103.5, notch=103.5),
    # a decisively-configured CTCSS channel (strong tone, voice tone far from
    # the Goertzel band): unlike nfm_ctcss, every fast-window max-power
    # decision is unambiguous, so this one must match the binary to float
    # roundoff — pinning the CTCSS path tight instead of arguing the
    # marginal case away (VERDICT r2)
    E2EChannel("nfm_ctcss_strong", CENTER - 250_600, "nfm", (1.2, 4.2), 900.0, ctcss=88.5, notch=88.5, ctcss_ampl=0.35),
]


def make_scene(seed: int = 11, noise_sigma: float = 0.004, channels: list[E2EChannel] | None = None) -> np.ndarray:
    """u8 interleaved IQ bytes for the test scene."""
    from rtlsdr_airband_tpu.utils.siggen import (
        am_carrier_iq,
        complex_noise,
        iq_to_u8,
        nfm_carrier_iq,
    )

    n = int(DURATION_S * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE

    audio_rate = 8000
    n_aud = int(DURATION_S * audio_rate)
    ta = np.arange(n_aud) / audio_rate

    iq = complex_noise(n, noise_sigma, seed=seed)
    for ch in channels if channels is not None else CHANNELS:
        audio = (0.8 * np.sin(2 * np.pi * ch.tone_hz * ta)).astype(np.float32)
        if ch.ctcss > 0:
            audio += (ch.ctcss_ampl * np.sin(2 * np.pi * ch.ctcss * ta)).astype(np.float32)
        tx = ch.freq + ch.carrier_offset_hz - CENTER
        if ch.modulation == "am":
            c = am_carrier_iq(SAMPLE_RATE, tx, n, audio=audio, carrier_ampl=0.22, mod_index=0.8, audio_rate=audio_rate)
        else:
            c = nfm_carrier_iq(SAMPLE_RATE, tx, n, audio=audio, deviation_hz=2500.0, carrier_ampl=0.22, audio_rate=audio_rate)
        iq += c * ((t >= ch.key[0]) & (t < ch.key[1])).astype(np.float32)
    return iq_to_u8(iq)


def make_ref_config(filepath: str, ports: dict[str, int], speedup: float, channels: list[E2EChannel] | None = None) -> str:
    chans = []
    for ch in channels if channels is not None else CHANNELS:
        opts = [f"freq = {ch.freq};", f'modulation = "{ch.modulation}";']
        if ch.afc > 0:
            opts.append(f"afc = {ch.afc};")
        if ch.ctcss > 0:
            opts.append(f"ctcss = {ch.ctcss};")
        if ch.bandwidth > 0:
            # must be an int: floats are MHz under parse_anynum2int (config.cpp:292-304)
            opts.append(f"bandwidth = {int(ch.bandwidth)};")
        if ch.notch > 0:
            opts.append(f"notch = {ch.notch};")
        if ch.ampfactor != 1.0:
            opts.append(f"ampfactor = {ch.ampfactor};")
        if ch.snr_threshold_db is not None:
            opts.append(f"squelch_snr_threshold = {ch.snr_threshold_db};")
        if ch.extra_conf:
            opts.append(ch.extra_conf)
        opts.append(
            f'outputs: ( {{ type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = {ports[ch.name]}; continuous = true; }} );'
        )
        chans.append("      {\n        " + "\n        ".join(opts) + "\n      }")
    return (
        f"fft_size = {FFT_SIZE};\n"
        "devices:\n(\n  {\n"
        '    type = "file";\n'
        f'    filepath = "{filepath}";\n'
        f"    speedup_factor = {speedup};\n"
        f"    centerfreq = {CENTER};\n"
        f"    sample_rate = {SAMPLE_RATE};\n"
        "    channels:\n(\n" + ",\n".join(chans) + "\n    );\n  }\n);\n"
    )


class UdpCapture(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # request a large buffer (the kernel caps at rmem_max; at speedup=4
        # each channel's whole stream is ~320 KB of bursts, and a capture
        # thread stalled behind the GIL under full-suite load must not drop)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 8 << 20)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(0.25)
        self.port = self.sock.getsockname()[1]
        self.chunks: list[bytes] = []
        self._done = threading.Event()

    def run(self):
        while not self._done.is_set():
            try:
                data, _ = self.sock.recvfrom(65536)
                self.chunks.append(data)
            except socket.timeout:
                continue

    def stop(self) -> np.ndarray:
        self._done.set()
        self.join(timeout=5)
        self.sock.close()
        return np.frombuffer(b"".join(self.chunks), np.float32)


def build_reference() -> str:
    import sys

    sys.path.insert(0, os.path.join(HERE, "refbuild"))
    try:
        from build import build  # tests/golden/refbuild/build.py
    finally:
        sys.path.pop(0)
    return build()


def _run_binary(u8: np.ndarray, workdir: str, cfg_for_ports, names: list[str], extra_args: tuple = (), timeout: float = 120) -> dict[str, np.ndarray]:
    """Run the built reference binary; ``cfg_for_ports(iqfile, ports)`` makes
    the config text, ``names`` are the UDP captures to open."""
    binary = build_reference()
    iqfile = os.path.join(workdir, "scene.cu8")
    if not os.path.exists(iqfile):
        u8.tofile(iqfile)
    caps = {name: UdpCapture() for name in names}
    for c in caps.values():
        c.start()
    cfg_path = os.path.join(workdir, "ref.conf")
    with open(cfg_path, "w") as f:
        f.write(cfg_for_ports(iqfile, {k: c.port for k, c in caps.items()}))
    # -F foreground (no TUI), -e log to stderr.  The binary exits on file EOF
    # (INPUT_FAILED -> devices_running==0, reference: rtl_airband.cpp:377-391).
    # the binary is a REAL-TIME consumer: its ring holds only ~1.25 s of
    # stream (x speedup less in wall time) and silently DROPS IQ when its
    # demod thread is CPU-starved — run it at elevated priority (we are
    # root in CI) and moderate speedup so full-suite load can't starve it
    nice = ["nice", "-n", "-10"] if os.geteuid() == 0 else []
    proc = subprocess.run(
        [*nice, binary, "-F", "-e", *extra_args, "-c", cfg_path],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=workdir,
    )
    audio = {k: c.stop() for k, c in caps.items()}
    if proc.returncode != 0:
        raise RuntimeError(f"reference binary rc={proc.returncode}\n{proc.stderr[-4000:]}")
    if min(len(a) for a in audio.values()) < WAVE_BATCH:
        raise RuntimeError(f"no audio captured from reference binary\n{proc.stderr[-4000:]}")
    return audio


def run_reference(u8: np.ndarray, workdir: str, speedup: float = 8, extra_args: tuple = ()) -> dict[str, np.ndarray]:
    """Run the built reference binary on the scene; returns captured audio."""
    return _run_binary(
        u8, workdir,
        lambda iqfile, ports: make_ref_config(iqfile, ports, speedup),
        [ch.name for ch in CHANNELS],
        extra_args=extra_args,
    )


def run_tpu(u8: np.ndarray, fm_quadri: bool = False, as_s16: bool = False, channelizer: str = "matmul", precision: str | None = None) -> dict[str, np.ndarray]:
    """Run our pipeline on the same bytes; returns per-channel audio.

    as_s16=True re-encodes the scene as s16 with fullscale 32640 = 127.5*256
    so the decoded floats are bit-identical to the u8 decode ((v*256)/32640
    and v/127.5 round the same real value once) — this drives the s16
    ship + on-device-decode path through the identical golden comparison.
    The unmodified reference binary itself can only ingest u8 from a file
    (input-file.cpp:170), so the s16 *decode semantics* are what this pins.

    ``channelizer``/``precision`` override the channelizer variant for the
    CTCSS-isolation experiment (scripts/e2e_ctcss_isolation.py): precision
    is a jax.lax.Precision name applied to the matmul-DFT taps; the jit
    caches are cleared so the override takes effect mid-process, and the
    prior module default is restored (with another cache clear) on the way
    out so later same-process callers don't inherit the override.
    """
    from rtlsdr_airband_tpu.ops.params import ChannelSpec
    from rtlsdr_airband_tpu.runtime.pipeline import Pipeline, PipelineConfig

    saved_precision = None
    if precision is not None:
        import jax

        from rtlsdr_airband_tpu.ops import channelizer as chmod

        saved_precision = chmod.MATMUL_PRECISION
        chmod.MATMUL_PRECISION = getattr(jax.lax.Precision, precision)
        jax.clear_caches()  # MATMUL_PRECISION is read at trace time
    try:
        return _run_tpu_inner(u8, fm_quadri, as_s16, channelizer)
    finally:
        if saved_precision is not None:
            import jax

            from rtlsdr_airband_tpu.ops import channelizer as chmod

            chmod.MATMUL_PRECISION = saved_precision
            jax.clear_caches()


def _run_tpu_inner(u8: np.ndarray, fm_quadri: bool, as_s16: bool, channelizer: str) -> dict[str, np.ndarray]:
    from rtlsdr_airband_tpu.ops.params import ChannelSpec
    from rtlsdr_airband_tpu.runtime.pipeline import Pipeline, PipelineConfig

    if as_s16:
        s16 = ((u8.astype(np.int32) - 128) * 256 + 128).astype(np.int16)
        # exact: u8 decode is (v - 127.5)/127.5; here (256*v - 32640)/32640
        # = same real value, one rounding each
        u8 = s16
        fmt, fullscale = "s16", 32640.0
    else:
        fmt, fullscale = "u8", 127.5
    cfg = PipelineConfig(
        sample_rate=SAMPLE_RATE,
        center_freq=CENTER,
        fft_size=FFT_SIZE,
        wave_rate=WAVE_RATE,
        sample_format=fmt,
        fullscale=fullscale,
        fm_quadri=fm_quadri,
        channelizer=channelizer,
    )
    specs = [
        ChannelSpec(
            frequency=ch.freq,
            modulation=ch.modulation,
            ctcss=ch.ctcss,
            bandwidth=ch.bandwidth,
            notch=ch.notch,
            ampfactor=ch.ampfactor,
            squelch_snr_threshold_db=ch.snr_threshold_db,
        )
        for ch in CHANNELS
    ]
    pipe = Pipeline(cfg, specs)
    blocks = []
    for out in pipe.feed(u8.tobytes()):
        blocks.append(np.asarray(out["audio"]))
    audio = np.concatenate(blocks, axis=0)  # [T, C]
    return {ch.name: audio[:, i].copy() for i, ch in enumerate(CHANNELS)}


@dataclass
class Comparison:
    lag: int
    snr_db: float
    gating_agreement: float
    open_fraction_ref: float
    open_fraction_tpu: float
    n: int = 0
    extras: dict = field(default_factory=dict)


def compare(ref: np.ndarray, tpu: np.ndarray, max_lag: int = 4000) -> Comparison:
    """Align by cross-correlation, then SNR over the jointly-open region."""
    n = min(len(ref), len(tpu))
    ref = ref[:n].astype(np.float64)
    tpu = tpu[:n].astype(np.float64)

    # coarse integer-lag alignment via FFT cross-correlation
    m = 1 << int(np.ceil(np.log2(2 * n)))
    R = np.fft.rfft(ref, m)
    T = np.fft.rfft(tpu, m)
    xc = np.fft.irfft(R * np.conj(T), m)
    lags = np.concatenate([np.arange(0, max_lag + 1), np.arange(-max_lag, 0)])
    vals = np.concatenate([xc[: max_lag + 1], xc[-max_lag:]])
    lag = int(lags[np.argmax(vals)])  # tpu must be shifted by +lag to match ref

    if lag >= 0:
        a, b = ref[lag:], tpu[: n - lag]
    else:
        a, b = ref[: n + lag], tpu[-lag:]

    open_a = a != 0.0
    open_b = b != 0.0
    gating = float(np.mean(open_a == open_b)) if len(a) else 0.0
    both = open_a & open_b
    if both.sum() > WAVE_BATCH:
        err = a[both] - b[both]
        snr = 10.0 * np.log10(float(np.sum(a[both] ** 2)) / max(float(np.sum(err**2)), 1e-30))
    else:
        snr = float("-inf")
    return Comparison(
        lag=lag,
        snr_db=round(float(snr), 2),
        gating_agreement=round(gating, 5),
        open_fraction_ref=round(float(np.mean(open_a)), 4),
        open_fraction_tpu=round(float(np.mean(open_b)), 4),
        n=len(a),
    )


def compare_guarded(ref: np.ndarray, tpu: np.ndarray, guard: int = 8000, max_lag: int = 4000) -> Comparison:
    """CTCSS-channel comparison excluding a ``guard`` window around every
    squelch gating edge (either stream).

    The reference's FAST CTCSS detector (0.05 s window = 20 Hz bins) decides
    between standard tones spaced 2-7 Hz apart — structurally below its
    resolution — so the first ~0.4 s after key-on (until the slow 2.5 Hz
    detector takes over) contains near-tie max-power decisions that flip on
    f32 channelizer roundoff in ANY implementation (triangulation: given
    identical channelizer output our demod matches the compiled binary's
    gating exactly and audio to 2e-5).  Outside those transition windows the
    slow detector governs and the comparison must be tight: gating EXACT,
    SNR to float roundoff."""
    n = min(len(ref), len(tpu))
    ref = ref[:n].astype(np.float64)
    tpu = tpu[:n].astype(np.float64)
    m = 1 << int(np.ceil(np.log2(2 * n)))
    xc = np.fft.irfft(np.fft.rfft(ref, m) * np.conj(np.fft.rfft(tpu, m)), m)
    lags = np.concatenate([np.arange(0, max_lag + 1), np.arange(-max_lag, 0)])
    vals = np.concatenate([xc[: max_lag + 1], xc[-max_lag:]])
    lag = int(lags[np.argmax(vals)])
    if lag >= 0:
        a, b = ref[lag:], tpu[: n - lag]
    else:
        a, b = ref[: n + lag], tpu[-lag:]

    keep = np.ones(len(a), bool)
    for x in (a, b):
        edges = np.flatnonzero(np.diff((x != 0.0).astype(np.int8)))
        for e in edges:
            keep[max(0, e - guard) : e + guard] = False
    open_a, open_b = (a != 0.0) & keep, (b != 0.0) & keep
    gating = float(np.mean(open_a[keep] == open_b[keep])) if keep.any() else 0.0
    both = open_a & open_b
    if both.sum() > WAVE_BATCH:
        err = a[both] - b[both]
        snr = 10.0 * np.log10(float(np.sum(a[both] ** 2)) / max(float(np.sum(err**2)), 1e-30))
    else:
        snr = float("-inf")
    return Comparison(
        lag=lag,
        snr_db=round(float(snr), 2),
        gating_agreement=round(gating, 5),
        open_fraction_ref=round(float(np.mean(a != 0.0)), 4),
        open_fraction_tpu=round(float(np.mean(b != 0.0)), 4),
        n=int(keep.sum()),
        extras={"guarded_samples": int((~keep).sum())},
    )


def run_e2e(workdir: str, speedup: float = 2) -> dict[str, Comparison]:
    u8 = make_scene()
    ref = run_reference(u8, workdir, speedup=speedup)
    tpu = run_tpu(u8)
    out = {ch.name: compare(ref[ch.name], tpu[ch.name]) for ch in CHANNELS}
    for ch in CHANNELS:
        if ch.ctcss > 0:  # slow-detector-governed region must be exact
            out[f"{ch.name}_guarded"] = compare_guarded(ref[ch.name], tpu[ch.name])
    # s16 ingest variant vs the SAME binary capture: the scene re-encoded as
    # s16 decodes to (near-)identical floats, pinning the s16 ship +
    # on-device decode path to the binary (see run_tpu docstring)
    tpu_s16 = run_tpu(u8, as_s16=True)
    for ch in CHANNELS[:2]:  # am + nfm suffice; scene is identical
        out[f"{ch.name}_s16"] = compare(ref[ch.name], tpu_s16[ch.name])
    return out


# ---- AFC golden (reference: class AFC, rtl_airband.cpp:180-251) ----
#
# The afc channel's carrier transmits +1.6 bins (3.2 kHz at 2 kHz/bin) above
# the configured frequency: on squelch open the hill-climb goes base -> +1
# (power ratio decisive) -> +2, then stops (+3's delta is ~2.6x below the
# grown threshold) — every comparison in the climb has a wide margin so the
# decision cannot flip on channelizer f32 roundoff between implementations.
# On key-off both sides revert to the base bin.  afc_off is the negative
# control: same off-carrier, AFC disabled, stays on the (shoulder-lit) base
# bin.  am anchors the lag alignment.
AFC_CHANNELS = [
    E2EChannel("am", CENTER + 40_000, "am", (0.5, 2.5), 400.0),
    E2EChannel("afc", CENTER - 60_000, "am", (0.8, 3.6), 500.0, afc=4, carrier_offset_hz=3_200.0),
    E2EChannel("afc_off", CENTER + 150_000, "am", (1.0, 4.0), 650.0, carrier_offset_hz=3_200.0),
]


def run_tpu_afc(u8: np.ndarray) -> tuple[dict[str, np.ndarray], list[int]]:
    """Our pipeline + host AFCTracker loop, block-synchronous exactly like
    the App's control-device path (chunk 1, async 0, finalize + set_bins per
    block — app.py:_handle_block)."""
    from rtlsdr_airband_tpu.ops.params import ChannelSpec
    from rtlsdr_airband_tpu.runtime.control import AFCTracker
    from rtlsdr_airband_tpu.runtime.pipeline import Pipeline, PipelineConfig

    cfg = PipelineConfig(
        sample_rate=SAMPLE_RATE, center_freq=CENTER, fft_size=FFT_SIZE,
        wave_rate=WAVE_RATE, sample_format="u8", fullscale=127.5,
        chunk_blocks=1, async_depth=0,
    )
    specs = [ChannelSpec(frequency=ch.freq, modulation=ch.modulation, afc=ch.afc) for ch in AFC_CHANNELS]
    pipe = Pipeline(cfg, specs)
    trackers = {
        i: AFCTracker(base_bin=int(pipe.base_bins[i]), afc=ch.afc, fft_size=FFT_SIZE)
        for i, ch in enumerate(AFC_CHANNELS) if ch.afc
    }
    blocks, bin_track = [], []
    for out in pipe.feed(u8.tobytes()):
        blocks.append(np.asarray(out["audio"]))
        spectrum = np.asarray(out["spectrum_power"])
        active = np.asarray(out["active"])
        new_bins = np.array(pipe.user_bins)
        for i, trk in trackers.items():
            new_bins[i] = trk.finalize(bool(active[i]), spectrum)
        bin_track.append(int(new_bins[next(iter(trackers))]))
        if not np.array_equal(new_bins, pipe.user_bins):
            pipe.set_bins(new_bins)
    audio = np.concatenate(blocks, axis=0)
    return {ch.name: audio[:, i].copy() for i, ch in enumerate(AFC_CHANNELS)}, bin_track


def run_e2e_afc(workdir: str) -> dict[str, Comparison]:
    u8 = make_scene(channels=AFC_CHANNELS)
    ref = _run_binary(
        u8, workdir,
        lambda iqfile, ports: make_ref_config(iqfile, ports, 2, channels=AFC_CHANNELS),
        [ch.name for ch in AFC_CHANNELS],
    )
    tpu, bin_track = run_tpu_afc(u8)
    out = {ch.name: compare(ref[ch.name], tpu[ch.name]) for ch in AFC_CHANNELS}
    base = int(bin_track[0]) if bin_track else -1
    out["afc"].extras["bin_track"] = sorted(set(bin_track))
    out["afc"].extras["retuned_blocks"] = sum(1 for b in bin_track if b != base)
    return out


def run_e2e_quadri(workdir: str) -> dict[str, Comparison]:
    """-Q: fm_quadri_demod instead of polar_disc_fast
    (reference: rtl_airband.cpp:174-176,725-761 getopt 'Q', :570)."""
    u8 = make_scene()
    ref = run_reference(u8, workdir, speedup=2, extra_args=("-Q",))
    tpu = run_tpu(u8, fm_quadri=True)
    return {ch.name: compare(ref[ch.name], tpu[ch.name]) for ch in CHANNELS}


MIXER_CHANNELS = [
    # on-bin AM carriers, hard-panned so each side of the stereo mix carries
    # one input (balance -> ampl/ampr, reference: mixer.cpp:81-85) and the
    # mixer-input ampfactor scales the right input
    E2EChannel("mix_l", CENTER + 40_000, "am", (0.5, 2.5), 400.0),
    E2EChannel("mix_r", CENTER - 60_000, "am", (1.0, 4.0), 520.0),
]
MIX_AMPFACTOR_R = 0.7


def make_mixer_scene() -> np.ndarray:
    from rtlsdr_airband_tpu.utils.siggen import am_carrier_iq, complex_noise, iq_to_u8

    n = int(DURATION_S * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    audio_rate = 8000
    ta = np.arange(int(DURATION_S * audio_rate)) / audio_rate
    iq = complex_noise(n, 0.004, seed=23)
    for ch in MIXER_CHANNELS:
        audio = (0.8 * np.sin(2 * np.pi * ch.tone_hz * ta)).astype(np.float32)
        c = am_carrier_iq(SAMPLE_RATE, ch.freq - CENTER, n, audio=audio, carrier_ampl=0.22, mod_index=0.8, audio_rate=audio_rate)
        iq += c * ((t >= ch.key[0]) & (t < ch.key[1])).astype(np.float32)
    return iq_to_u8(iq)


def _mixer_ref_config(iqfile: str, ports: dict[str, int], speedup: float) -> str:
    return (
        f"fft_size = {FFT_SIZE};\n"
        "mixers: {\n  mx: {\n    outputs: ( {\n"
        f'      type = "udp_stream"; dest_address = "127.0.0.1"; dest_port = {ports["mix"]}; continuous = true;\n'
        "    } );\n  };\n};\n"
        "devices:\n(\n  {\n"
        '    type = "file";\n'
        f'    filepath = "{iqfile}";\n'
        f"    speedup_factor = {speedup};\n"
        f"    centerfreq = {CENTER};\n"
        f"    sample_rate = {SAMPLE_RATE};\n"
        "    channels:\n(\n"
        f'      {{ freq = {MIXER_CHANNELS[0].freq}; modulation = "am";\n'
        '        outputs: ( { type = "mixer"; name = "mx"; balance = -1.0; } ); },\n'
        f'      {{ freq = {MIXER_CHANNELS[1].freq}; modulation = "am";\n'
        f'        outputs: ( {{ type = "mixer"; name = "mx"; balance = 1.0; ampfactor = {MIX_AMPFACTOR_R}; }} ); }}\n'
        "    );\n  }\n);\n"
    )


def run_e2e_mixer(workdir: str) -> dict[str, Comparison]:
    """Stereo mixer golden vs the binary: two AM channels hard-panned L/R
    with an ampfactor on the right input, mixed by the reference's
    mixer_thread (mixer.cpp:157-261) into one stereo udp_stream.  Runs the
    binary at real-time pace (speedup=1) so its wall-clock mixer never drops
    a batch; our App processes the same bytes unpaced (its mixer deadline
    logic is lossless for faster-than-realtime streams)."""
    u8 = make_mixer_scene()
    ref = _run_binary(
        u8, workdir,
        lambda iqfile, ports: _mixer_ref_config(iqfile, ports, speedup=1),
        ["mix"],
        timeout=180,
    )["mix"]
    ref_l, ref_r = ref[0::2], ref[1::2]

    # our side: the production App with the equivalent config
    from rtlsdr_airband_tpu.app import App
    from rtlsdr_airband_tpu.runtime.config import loads_config

    iqfile = os.path.join(workdir, "scene_app.cu8")
    u8.tofile(iqfile)
    cap = UdpCapture()
    cap.start()
    cfg = loads_config(
        f"fft_size = {FFT_SIZE};\nwave_rate = {WAVE_RATE};\n"
        "mixers: {{ mx: {{ outputs: ( {{ type = \"udp_stream\"; dest_address = \"127.0.0.1\"; dest_port = {port}; continuous = true; }} ); }}; }};\n".format(port=cap.port)
        + f'devices: ( {{ type = "file"; filepath = "{iqfile}"; centerfreq = {CENTER}; '
        f'sample_rate = {SAMPLE_RATE}; sample_format = "u8"; speedup_factor = 0.0; channels: ( '
        f'{{ freq = {MIXER_CHANNELS[0].freq}; modulation = "am"; outputs: ( {{ type = "mixer"; name = "mx"; balance = -1.0; }} ); }}, '
        f'{{ freq = {MIXER_CHANNELS[1].freq}; modulation = "am"; outputs: ( {{ type = "mixer"; name = "mx"; balance = 1.0; ampfactor = {MIX_AMPFACTOR_R}; }} ); }} ); }} );\n'
    )
    app = App(cfg)
    app.run(max_seconds=120.0)
    mine = cap.stop()
    mine_l, mine_r = mine[0::2], mine[1::2]

    # The reference mixer is wall-clock driven and LOSSY under bursty file
    # input (mixer_put_samples drops a batch whenever the previous one is
    # still pending, mixer.cpp:114-131; its auto-disable also drops the
    # final batches at EOF, :96-112) — observed: ~4 of 16 L batches dropped
    # at speedup=1, including MID-run skips.  A stream-equality golden is
    # therefore not a deterministic target; what IS deterministic is the mix
    # MATH (balance -> ampl/ampr weights, input ampfactor, stereo
    # interleave) and each surviving batch's audio content.  Pin those:
    # every active reference BATCH must appear sample-exactly, in order, in
    # our lossless stream.
    return {
        "mix_l": compare_batches(ref_l, mine_l),
        "mix_r": compare_batches(ref_r, mine_r),
    }


def compare_batches(ref: np.ndarray, mine: np.ndarray, W: int = WAVE_BATCH) -> Comparison:
    """Match every fully-active ref batch (length W) into our stream at its
    best sample-level offset, offsets NON-decreasing — the reference mixer
    both drops batches and re-emits stale ones under bursty file input, so
    consecutive ref batches can be byte-identical duplicates (see
    run_e2e_mixer).  snr_db is the WORST matched batch; extras counts
    matched/active batches."""
    m = mine.astype(np.float64)
    nzr = np.abs(ref) > 1e-6
    r0 = np.flatnonzero(nzr)
    if not len(r0) or not len(m):
        return Comparison(lag=0, snr_db=float("-inf"), gating_agreement=0.0, open_fraction_ref=0.0, open_fraction_tpu=0.0)
    # local energy of every length-W window of ours, for normalized xcorr
    c1 = np.concatenate([[0.0], np.cumsum(m * m)])
    energy = c1[W:] - c1[:-W]  # energy[o] = sum m[o:o+W]^2

    worst = float("inf")
    matched = active = 0
    prev_off = 0
    lags = []
    start = r0[0]
    for i in range((len(ref) - start) // W):
        a = ref[start + i * W : start + (i + 1) * W].astype(np.float64)
        if np.abs(a).min() <= 1e-6:  # only fully-active batches are pinned
            continue
        active += 1
        corr = np.correlate(m, a, mode="valid")
        score = corr / np.sqrt(np.maximum(energy[: len(corr)], 1e-12))
        if prev_off >= len(score):
            continue
        off = prev_off + int(np.argmax(score[prev_off:]))
        b = m[off : off + W]
        err = float(np.sum((a - b) ** 2))
        snr = 10.0 * np.log10(float(np.sum(a**2)) / max(err, 1e-30))
        matched += 1
        prev_off = off
        lags.append(off - (start + i * W))
        worst = min(worst, snr)
    return Comparison(
        lag=int(lags[-1]) if lags else 0,
        snr_db=round(float(worst), 2),
        gating_agreement=round(matched / max(active, 1), 5),
        open_fraction_ref=round(float(np.mean(nzr)), 4),
        open_fraction_tpu=round(float(np.mean(np.abs(mine) > 1e-6)), 4),
        n=matched * W,
        extras={"batches_matched": matched, "batches_active": active},
    )
