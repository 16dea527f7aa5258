#!/usr/bin/env python
"""Latency-floor experiment (VERDICT r2 item 9): the demod block is a
sequential 2000-step per-sample loop; below ~1k channels the block cost is
pure per-step latency (~2.6 us/step).  Does unrolling the Mosaic fori_loop
amortize enough loop overhead to lower the floor?

Times demod_block_pallas alone (channelizer excluded) at a small channel
count with unroll in {1, 2, 4}, bench.py protocol (K distinct blocks chained
in one jitted lax.scan, completion forced by a host fetch, min over reps).
Prints one JSON line per unroll factor.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from rtlsdr_airband_tpu.models.flagship import build_flagship
    from rtlsdr_airband_tpu.ops.demod_pallas import demod_block_pallas

    C = int(os.environ.get("BENCH_CHANNELS", "512"))
    K, reps = 8, 3
    bk, (x, bins, window, params, state) = build_flagship(n_channels=C, wave_rate=16000)
    W = bk["n_frames"]

    rng = np.random.default_rng(7)
    mags = jnp.asarray(rng.random((K, W, C), np.float32) * 0.1)
    iqs = jnp.asarray(rng.random((K, W, C, 2), np.float32) * 0.1)

    unrolls = tuple(int(u) for u in os.environ.get("BENCH_UNROLLS", "1,2,4").split(","))
    for unroll in unrolls:
        @jax.jit
        def chain(mags, iqs, state):
            def body(st, xb):
                st, audio, _iq, flags = demod_block_pallas(
                    params, st, xb[0], xb[1],
                    fm_quadri=bk["fm_quadri"], with_ctcss=bk["with_ctcss"], unroll=unroll,
                )
                return st, jnp.sum(jnp.abs(audio))
            return jax.lax.scan(body, state, (mags, iqs))

        def once():
            t0 = time.perf_counter()
            _st, s = chain(mags, iqs, state)
            np.asarray(s)
            return time.perf_counter() - t0

        once()
        dt = min(once() for _ in range(reps)) / K
        print(json.dumps({
            "unroll": unroll, "demod_ms_per_block": round(dt * 1e3, 3),
            "us_per_step": round(dt / W * 1e6, 3), "n_channels": C,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
