#!/usr/bin/env python
"""Scaling sweeps for the flagship pipeline.

Two sweeps, each printing one JSON line per point:

  --channels   channel-count sweep on the local accelerator (the 1-chip
               "channels x Msps" scaling curve; uses the honest chained-
               dispatch protocol from bench.py)
  --devices    device-count sweep of the sharded step on a virtual CPU mesh
               (validates the (time, chan) mesh mechanics without a pod;
               CPU wall times are NOT TPU performance numbers)

On a real pod slice, run --channels per host under jax.distributed for the
N-host curve (parallel/multihost.py).
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def channel_sweep(counts, K=8, reps=3):
    import jax
    import jax.numpy as jnp

    from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from rtlsdr_airband_tpu.models.flagship import build_flagship
    from rtlsdr_airband_tpu.runtime.pipeline import default_demod_backend, pipeline_block

    backend = default_demod_backend()
    for C in counts:
        kw, (x, bins, window, params, state) = build_flagship(n_channels=C, sample_rate=2_560_000, wave_rate=16000)
        fn = functools.partial(pipeline_block, demod_backend=backend, **kw)
        rng = np.random.default_rng(7)
        xs = jnp.asarray(np.asarray(x)[None] + rng.normal(0, 0.01, (K,) + x.shape).astype(np.float32))

        @jax.jit
        def chain(xs, bins, window, params, state):
            def body(st, xb):
                st, out = fn(xb, bins, window, params, st)
                return st, jnp.sum(jnp.abs(out["audio"]))
            return jax.lax.scan(body, state, xs)

        def once():
            t0 = time.perf_counter()
            _st, sums = chain(xs, bins, window, params, state)
            np.asarray(sums)
            return time.perf_counter() - t0

        try:
            once()
        except Exception as e:  # same fallback as bench.py
            if backend == "pallas":
                print(f"pallas failed ({type(e).__name__}); falling back to xla", file=sys.stderr)
                backend = "xla"
                fn = functools.partial(pipeline_block, demod_backend=backend, **kw)
                chain = jax.jit(chain.__wrapped__)
                once()
            else:
                raise
        dt = min(once() for _ in range(reps)) / K
        msps = C * kw["n_frames"] * kw["hop"] / dt / 1e6
        print(json.dumps({
            "sweep": "channels", "n_channels": C, "block_ms": round(dt * 1e3, 3),
            "channel_msps": round(msps, 1), "realtime_factor": round(0.125 / dt, 2),
            "backend": backend,
        }), flush=True)


def device_sweep(counts):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={max(counts)}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rtlsdr_airband_tpu.models.flagship import build_flagship
    from rtlsdr_airband_tpu.parallel.sharding import make_pipeline_mesh, make_sharded_pipeline_step, replicate, shard_last

    W, C = 256, 64
    kw, (x, bins, window, params, state) = build_flagship(n_channels=C, wave_batch=W)
    for n in counts:
        mesh = make_pipeline_mesh(jax.devices()[:n])
        step = make_sharded_pipeline_step(mesh, hop=kw["hop"], fft_size=kw["fft_size"], n_frames=W, with_ctcss=True)
        args = (replicate(mesh, x), replicate(mesh, bins), replicate(mesh, window), shard_last(mesh, params), shard_last(mesh, state))
        st, audio, _iq, _act = step(*args)
        s0 = float(np.asarray(jnp.sum(jnp.abs(audio))))
        t0 = time.perf_counter()
        for _ in range(3):
            st, audio, _iq, _act = step(*args)
            np.asarray(jnp.sum(jnp.abs(audio)))
        dt = (time.perf_counter() - t0) / 3
        print(json.dumps({
            "sweep": "devices", "n_devices": n, "mesh": dict(mesh.shape),
            "block_ms": round(dt * 1e3, 2), "audio_checksum": round(s0, 2),
        }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", nargs="*", type=int, default=None)
    ap.add_argument("--devices", nargs="*", type=int, default=None)
    args = ap.parse_args()
    if args.devices is not None:
        device_sweep(args.devices or [1, 2, 4, 8])
    else:
        channel_sweep(args.channels or [512, 2048, 4096, 8192])
    return 0


if __name__ == "__main__":
    sys.exit(main())
