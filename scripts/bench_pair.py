#!/usr/bin/env python
"""Round-5 latency-floor experiment: two-tile co-scheduling (pair mode).

scripts/bench_chain_probe.py measured that a second independent 32-sublane
dependency chain rides the first one's latency shadow at +1% cost on v5e.
This measures whether the REAL demod kernel (whose ~50 live rows caused the
round-4 64-sublane probe to spill) gets the same overlap when two channel
tiles share each loop trip: compiled parity vs the XLA scan, then
demod-kernel-only ms/block for pair=False vs pair=True at C=8192 (G=2).

    python scripts/bench_pair.py          # on the real chip
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
    from rtlsdr_airband_tpu.runtime.pipeline import channelize_block

    if not jax.devices()[0].platform.startswith("tpu"):
        print(f"SKIP: no TPU (platform={jax.devices()[0].platform})")
        return 0

    C = int(os.environ.get("BENCH_PAIR_CHANNELS", "8192"))
    K = int(os.environ.get("BENCH_PAIR_K", "8"))
    kw, (x, bins, window, params, state) = build_flagship(n_channels=C, sample_rate=2_560_000, wave_rate=16000)
    ckw = {k: kw[k] for k in ("hop", "fft_size", "n_frames")}
    mags, iqs = channelize_block(x, bins, window, **ckw)

    # compiled parity: pair result must equal non-pair bit-for-bit
    st_a, a_a, _, o_a = demod_block_pallas(params, state, mags, iqs, pair=False)
    st_b, a_b, _, o_b = demod_block_pallas(params, state, mags, iqs, pair=True)
    da = np.abs(np.asarray(a_a) - np.asarray(a_b)).max()
    om = bool(np.array_equal(np.asarray(o_a), np.asarray(o_b)))
    dcur = int(np.abs(np.asarray(st_a.cur) - np.asarray(st_b.cur)).max())
    print(f"[pair] compiled parity: |audio diff|={da:.2e} flags={om} cur diff={dcur}", file=sys.stderr, flush=True)

    def bench(pair, reps=3):
        fn = functools.partial(demod_block_pallas, with_ctcss=True, pair=pair)
        rng = np.random.default_rng(1)
        magss = jnp.asarray(np.abs(rng.normal(0, 1.0, (K,) + mags.shape)).astype(np.float32))
        iqss = jnp.asarray(rng.normal(0, 0.5, (K,) + iqs.shape).astype(np.float32))

        @jax.jit
        def multi(magss, iqss, st):
            def body(st, mi):
                st, a, _, _ = fn(params, st, mi[0], mi[1])
                return st, jnp.sum(jnp.abs(a))

            return jax.lax.scan(body, st, (magss, iqss))

        _st, sums = multi(magss, iqss, state)
        np.asarray(sums)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _st, sums = multi(magss, iqss, state)
            np.asarray(sums)
            ts.append(time.perf_counter() - t0)
        return min(ts) / K * 1e3

    t_single = bench(False)
    print(f"[pair] pair=False: {t_single:.3f} ms/block", file=sys.stderr, flush=True)
    t_pair = bench(True)
    print(f"[pair] pair=True:  {t_pair:.3f} ms/block", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "demod_pair_coschedule",
        "channels": C,
        "ms_single": round(t_single, 3),
        "ms_pair": round(t_pair, 3),
        "speedup": round(t_single / t_pair, 3),
        "parity": {"audio_maxdiff": float(da), "flags_equal": om, "cur_diff": dcur},
    }))
    return 0 if (da == 0.0 and om and dcur == 0) else 1


if __name__ == "__main__":
    sys.exit(main())
