#!/usr/bin/env python
"""Channelizer matmul precision experiment (VERDICT r1 item 6).

Times channelize_matmul's complex DFT-by-matmul at every MXU precision mode
and measures its accuracy against a float64 host reference on the same
input, so the keep/revert decision in BENCH_SCALING.md is backed by numbers:

  default   whatever jnp.dot does with f32 inputs on this chip
  high      bf16_3x / tf32-class multi-pass
  highest   full f32 (6-pass)
  bf16      explicit bfloat16 inputs, f32 accumulation (1 MXU pass)

Accuracy gate: the golden E2E bound (tests/test_e2e_reference.py) needs
>= 80 dB audio SNR vs the reference binary; the channelizer's own output
must clear that with margin.  Prints one JSON line per mode.
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

    from rtlsdr_airband_tpu.ops.channelizer import make_frames, make_taps
    from rtlsdr_airband_tpu.ops.window import blackman_harris_7
    from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    C = int(os.environ.get("BENCH_CHANNELS", "8192"))
    N, hop, W = 512, 160, 2000
    K, reps = 8, 3

    rng = np.random.default_rng(5)
    L = (W - 1) * hop + N
    x = rng.normal(0, 0.1, (L, 2)).astype(np.float32)
    bins = jnp.asarray(rng.integers(0, N, C).astype(np.int32))
    window = jnp.asarray(blackman_harris_7(N))
    tr, ti = jax.jit(make_taps)(bins, window)

    # ---- float64 host reference on one frame subset (full f64 DFT)
    frames64 = np.asarray(make_frames(jnp.asarray(x), hop, N, W))[:64].astype(np.float64)
    z64 = frames64[..., 0] + 1j * frames64[..., 1]
    w64 = np.asarray(window, np.float64)
    k = np.arange(N)
    b64 = np.asarray(bins)[:, None] * k[None, :]
    taps64 = w64[None, :] * np.exp(-2j * np.pi * b64 / N)
    ref = z64 @ taps64.T  # [64, C] complex128
    ref_pow = float(np.mean(np.abs(ref) ** 2))

    def run_mode(mode):
        if mode == "bf16":
            def mm(a, b):
                return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        else:
            prec = {"default": None, "high": jax.lax.Precision.HIGH, "highest": jax.lax.Precision.HIGHEST}[mode]

            def mm(a, b):
                return jnp.dot(a, b, precision=prec)

        @functools.partial(jax.jit, static_argnames=())
        def chan(x, tr, ti):
            frames = make_frames(x, hop, N, W)
            fr, fi = frames[..., 0], frames[..., 1]
            yr = mm(fr, tr.T) - mm(fi, ti.T)
            yi = mm(fr, ti.T) + mm(fi, tr.T)
            return yr, yi

        # accuracy
        yr, yi = chan(jnp.asarray(x), tr, ti)
        got = np.asarray(yr[:64]).astype(np.float64) + 1j * np.asarray(yi[:64]).astype(np.float64)
        err = float(np.mean(np.abs(got - ref) ** 2))
        snr_db = 10 * np.log10(ref_pow / err) if err > 0 else float("inf")

        # timing: chain K distinct blocks, fetch a checksum (bench.py protocol)
        xs = jnp.asarray(x[None] + rng.normal(0, 0.01, (K,) + x.shape).astype(np.float32))

        @jax.jit
        def chain(xs, tr, ti):
            def body(c, xb):
                yr, yi = chan(xb, tr, ti)
                return c, jnp.sum(jnp.abs(yr)) + jnp.sum(jnp.abs(yi))
            return jax.lax.scan(body, 0.0, xs)

        def once():
            t0 = time.perf_counter()
            _c, s = chain(xs, tr, ti)
            np.asarray(s)
            return time.perf_counter() - t0

        once()
        dt = min(once() for _ in range(reps)) / K
        print(json.dumps({
            "mode": mode, "chan_ms": round(dt * 1e3, 3), "snr_db": round(snr_db, 1),
            "n_channels": C, "gflops": round(8 * W * N * C / dt / 1e9, 0),
        }), flush=True)

    for mode in ("default", "high", "highest", "bf16"):
        run_mode(mode)
    return 0


if __name__ == "__main__":
    sys.exit(main())
