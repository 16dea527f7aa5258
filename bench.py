"""Benchmark: demodulated channel-throughput of the flagship pipeline on one TPU chip.

Metric: channel-Msps per chip — (channels × input samples/s consumed) at the
measured block rate.  Baseline anchor: the reference's designed real-time
workload is 8 channels × 2.56 Msps on a Raspberry-Pi-class CPU (SURVEY.md §6,
reference constants rtl_airband.h:64-94) = 20.48 channel-Msps; vs_baseline is
our measured throughput over that anchor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from rtlsdr_airband_tpu.models.flagship import build_flagship
    from rtlsdr_airband_tpu.runtime.pipeline import pipeline_block

    n_channels = int(os.environ.get("BENCH_CHANNELS", "2048"))
    sample_rate = 2_560_000
    wave_rate = 16000
    reps = int(os.environ.get("BENCH_REPS", "20"))

    block_kwargs, (x, bins, window, params, state) = build_flagship(
        n_channels=n_channels, sample_rate=sample_rate, wave_rate=wave_rate
    )
    W = block_kwargs["n_frames"]
    hop = block_kwargs["hop"]

    import functools

    fn = jax.jit(functools.partial(pipeline_block, **block_kwargs))

    # warmup / compile
    state1, out = fn(x, bins, window, params, state)
    jax.block_until_ready(out["audio"])

    # steady state: thread the carried state like the real pipeline does
    t0 = time.perf_counter()
    st = state1
    for _ in range(reps):
        st, out = fn(x, bins, window, params, st)
    jax.block_until_ready(out["audio"])
    dt = (time.perf_counter() - t0) / reps

    block_realtime = W / wave_rate  # seconds of signal per block
    input_sps = W * hop / dt  # input samples processed per wall second
    channel_msps = n_channels * input_sps / 1e6
    baseline_channel_msps = 8 * sample_rate / 1e6  # reference design point

    result = {
        "metric": "demod_channel_throughput",
        "value": round(channel_msps, 2),
        "unit": "channel-Msps/chip",
        "vs_baseline": round(channel_msps / baseline_channel_msps, 2),
        "detail": {
            "n_channels": n_channels,
            "block_ms": round(dt * 1e3, 3),
            "realtime_factor": round(block_realtime / dt, 2),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
