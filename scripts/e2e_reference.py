"""Run the end-to-end golden comparison vs the built reference binary and
write E2E_GOLDEN.md with the measured bounds.

Usage: python scripts/e2e_reference.py  (CPU; forces the test mesh config)
"""

import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests", "golden"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from e2e_ref import CHANNELS, DURATION_S, FFT_SIZE, SAMPLE_RATE, WAVE_RATE, run_e2e  # noqa: E402


def main() -> int:
    with tempfile.TemporaryDirectory() as td:
        res = run_e2e(td)
    lines = [
        "# E2E_GOLDEN — TPU pipeline vs the ACTUAL reference binary",
        "",
        "The unmodified reference sources are compiled out-of-tree"
        " (tests/golden/refbuild/: real-FFT fftw3f shim, minimal libconfig++,"
        " inert shout stub, real libmp3lame; NFM build, WAVE_RATE=16000) and run"
        f" on a synthetic {DURATION_S:.0f} s u8 IQ scene at {SAMPLE_RATE} sps,"
        f" fft_size {FFT_SIZE}, via a `file` input and per-channel `udp_stream`"
        " outputs (continuous f32 audio).  The TPU pipeline consumes the same"
        " bytes; streams are aligned by cross-correlation.",
        "",
        "SNR is measured over the jointly-open samples; gating agreement is the"
        " fraction of samples where both sides agree on squelch open/closed.",
        "",
        "| channel | features | lag | SNR (dB) | gating | open frac (ref/tpu) |",
        "|---|---|---|---|---|---|",
    ]
    feat = {
        "am": "plain AM, on-bin",
        "nfm": "plain NFM, 0.2 bins off (fixed-point derotator)",
        "am_bw": "AM + bandwidth 6 kHz (Bessel) + ampfactor 1.5 + SNR threshold 12 dB",
        "nfm_ctcss": "NFM + CTCSS 103.5 Hz + notch 103.5 Hz",
    }
    for ch in CHANNELS:
        c = res[ch.name]
        lines.append(
            f"| {ch.name} | {feat[ch.name]} | {c.lag} | {c.snr_db} | {c.gating_agreement} | {c.open_fraction_ref}/{c.open_fraction_tpu} |"
        )
    lines += [
        "",
        "Asserted bounds (tests/test_e2e_reference.py): exact channels |lag|<=2,",
        "SNR >= 80 dB, gating >= 0.999; CTCSS channel SNR >= 25 dB, gating >= 0.985.",
        "",
        "The CTCSS channel's fast detector (0.05 s window = 20 Hz bins) makes",
        "threshold-marginal max-power decisions; a single window at key-on can",
        "flip on f32 channelizer roundoff (matmul DFT vs per-frame FFT).",
        "Triangulation: scalar refmodel vs binary gating agreement is 1.0 and",
        "kernel vs refmodel steady-state audio error <= 2e-5, so the bound is",
        "set by detector marginality, not by a semantic gap.",
        "",
    ]
    out = os.path.join(os.path.dirname(__file__), "..", "E2E_GOLDEN.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    worst_exact = min(res[k].snr_db for k in ("am", "nfm", "am_bw"))
    ok = worst_exact >= 80 and res["nfm_ctcss"].snr_db >= 25
    print(f"worst exact-channel SNR: {worst_exact} dB -> {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
