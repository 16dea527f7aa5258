#!/usr/bin/env python
"""Round artifact: the reference-binary E2E golden, run ON THE TPU platform,
recorded as one JSON file with the TIGHT production bounds asserted.

The CPU test suite runs the same harness with loosened CTCSS bounds (XLA:CPU
takes a different Goertzel tie-break — see E2E_GOLDEN.md); the production
claim (every channel >= 80 dB SNR vs the actual reference binary, squelch
gating identical including the CTCSS channel) is only assertable on the TPU
platform.  This script machine-checks it each round the way bench.py does
for performance:

    python scripts/e2e_record.py [--out E2E_r05.json]

Exit 0 iff every bound holds; the JSON records per-channel SNR/gating/lag
either way.  The reference binary itself is compiled from the unmodified
sources out-of-tree (tests/golden/refbuild) and always runs on host CPU.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests", "golden"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BOUNDS = {
    # channel name -> (min SNR dB, min gating agreement)
    "am": (80.0, 0.999),
    "nfm": (80.0, 0.999),
    "am_bw": (80.0, 0.999),
    # the round-3/4 tightened CTCSS claim: on the TPU platform the Goertzel
    # bank matches the binary's tone decisions exactly (gating == 1.0)
    "nfm_ctcss": (80.0, 1.0),
    # the strong-tone channel's steady-state SNR vs the binary is 64.6 dB on
    # TPU (E2E_GOLDEN.md round-4 isolation table — reproduced to 0.01 dB in
    # round 5): the 2x-amplitude 88.5 Hz tone + notch leave a larger share
    # of the compared energy in the notch transient; gating is still exact
    "nfm_ctcss_strong": (60.0, 1.0),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "E2E_r05.json"))
    args = ap.parse_args()

    from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    platform = jax.devices()[0].platform
    device = str(jax.devices()[0].device_kind) if hasattr(jax.devices()[0], "device_kind") else platform

    from e2e_ref import CHANNELS, DURATION_S, SAMPLE_RATE, run_e2e

    with tempfile.TemporaryDirectory() as td:
        res = run_e2e(td)

    channels = {}
    ok = True
    for ch in CHANNELS:
        c = res[ch.name]
        min_snr, min_gate = BOUNDS[ch.name]
        passed = bool(abs(c.lag) <= 2 and c.snr_db >= min_snr and c.gating_agreement >= min_gate)
        ok &= passed
        channels[ch.name] = {
            "snr_db": c.snr_db,
            "gating_agreement": c.gating_agreement,
            "lag": c.lag,
            "open_fraction_ref": c.open_fraction_ref,
            "open_fraction_tpu": c.open_fraction_tpu,
            "bound_snr_db": min_snr,
            "bound_gating": min_gate,
            "pass": passed,
        }

    out = {
        "metric": "e2e_vs_reference_binary",
        "platform": platform,
        "device": device,
        "scene_seconds": DURATION_S,
        "sample_rate": SAMPLE_RATE,
        "channels": channels,
        "pass": bool(ok),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
