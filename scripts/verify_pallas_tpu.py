#!/usr/bin/env python
"""On-TPU verification of the compiled Pallas demod kernel.

Compiled-kernel parity vs the XLA lax.scan path (tests/test_demod_pallas.py
covers interpreter-mode parity on CPU; this checks the Mosaic-compiled kernel
on real hardware) plus an honest perf comparison.  Run on a machine with a
TPU attached: ``python scripts/verify_pallas_tpu.py``.
"""

import functools
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
    from rtlsdr_airband_tpu.ops.demod import demod_block
    from rtlsdr_airband_tpu.ops.demod_pallas import demod_block_pallas
    from rtlsdr_airband_tpu.runtime.pipeline import channelize_block

    if not jax.devices()[0].platform.startswith("tpu"):
        print(f"SKIP: no TPU (platform={jax.devices()[0].platform})")
        return 0

    C = 2048
    kw, (x, bins, window, params, state) = build_flagship(n_channels=C, sample_rate=2_560_000, wave_rate=16000)
    ckw = {k: kw[k] for k in ("hop", "fft_size", "n_frames")}
    mags, iqs = channelize_block(x, bins, window, **ckw)

    st_p, a_p, iq_p, o_p = demod_block_pallas(params, state, mags, iqs)
    st_x, a_x, iq_x, o_x = demod_block(params, state, mags, iqs)
    da = np.abs(np.asarray(a_x) - np.asarray(a_p)).max()
    om = np.array_equal(np.asarray(o_x), np.asarray(o_p))
    dcur = np.abs(np.asarray(st_x.cur) - np.asarray(st_p.cur)).max()
    print(f"parity: |audio diff|={da:.2e} open_flags match={om} cur diff={dcur}")
    ok = da < 1e-4 and om and dcur == 0

    def bench(fn, K=16, reps=3):
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

    tp = bench(functools.partial(demod_block_pallas, with_ctcss=True))
    tx = bench(functools.partial(demod_block, with_ctcss=True), K=4, reps=1)
    print(f"pallas: {tp:.2f} ms/block   xla scan: {tx:.2f} ms/block   speedup: {tx / tp:.1f}x")
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
