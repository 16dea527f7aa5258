#!/usr/bin/env python
"""Latency-floor diagnostic (round-5 VERDICT item 8): WHAT is the demod
kernel's 2.1 µs/step made of, and can a second independent channel tile
hide in its latency shadow?

Three synthetic Mosaic kernels, each a W-trip fori_loop whose body is a
chain of L dependent elementwise ops on (SUBL, 128) f32 tiles:

  chain1   — one dependent chain, state carried in VMEM scratch between
             trips (the demod kernel's structure);
  chain2   — TWO independent chains (separate scratch rows) interleaved in
             the same loop body: the co-scheduling candidate.  If the step
             cost is pure dependency-chain latency, chain2 ~= chain1
             (second chain rides the shadow -> rewrite the demod kernel to
             co-schedule two 32-wide tiles).  If it is issue- or
             VMEM-ordering-bound, chain2 ~= 2x chain1 (co-scheduling buys
             nothing — the recorded negative, with the reasoning attached);
  chain1w  — one chain twice as WIDE (2*SUBL sublanes): the round-4
             64-sublane probe's synthetic twin, separating register
             pressure (spills) from issue width.

Timing protocol: bench.py's (distinct-input blocks chained in one jitted
scan, completion forced by a fetched reduction, min over reps).

    python scripts/bench_chain_probe.py           # on the real chip
    PROBE_CPU=1 python scripts/bench_chain_probe.py  # interpret-mode smoke
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W = 2000  # loop trips (= audio samples per block)
L = 40  # dependent ops per chain per trip
SUBL = 32
REPS = 5
K = 4  # blocks chained per dispatch


def main() -> int:
    interpret = os.environ.get("PROBE_CPU", "0") == "1"
    if interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F32 = jnp.float32

    def body_chain(v, x, n):
        # n dependent fused multiply-adds: each op needs the previous result
        for i in range(n):
            v = v * F32(0.9995) + x * F32(1e-4)
        return v

    def make(kind, subl):
        def kernel(x_ref, o_ref, st):
            @pl.when(pl.program_id(0) == 0)
            def _():
                st[:] = x_ref[:]

            def step(k, c):
                x = x_ref[:]
                if kind == "chain1":
                    st[0] = body_chain(st[0], x[0], L)
                elif kind == "chain2":
                    # two independent chains interleaved: build both in one
                    # trace so Mosaic is free to interleave their schedules
                    a, b = st[0], st[1]
                    xa, xb = x[0], x[1]
                    for i in range(L):
                        a = a * F32(0.9995) + xa * F32(1e-4)
                        b = b * F32(0.9997) + xb * F32(1e-4)
                    st[0] = a
                    st[1] = b
                return c

            jax.lax.fori_loop(0, W, step, 0)
            o_ref[:] = st[:]

        rows = 2
        shape = (rows, subl, 128)
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            scratch_shapes=[pltpu.VMEM(shape, jnp.float32)],
            grid=(1,),
            interpret=interpret,
        )
        return jax.jit(lambda xs: jax.lax.scan(lambda c, x: (c + jnp.sum(f(x)), 0.0), jnp.float32(0), xs)[0])

    rng = np.random.default_rng(0)
    out = {}
    for kind, subl in (("chain1", SUBL), ("chain2", SUBL), ("chain1w", 2 * SUBL)):
        k = "chain1" if kind == "chain1w" else kind
        fn = make(k, subl)
        xs = jnp.asarray(rng.normal(size=(K, 2, subl, 128)).astype(np.float32))
        r = fn(xs)
        r.block_until_ready()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            v = fn(xs)
            float(np.asarray(v))  # honest completion fetch (CLAUDE.md)
            best = min(best, (time.perf_counter() - t0) / K)
        out[kind] = dict(ms_per_block=round(best * 1e3, 3), us_per_step=round(best / W * 1e6, 3), subl=subl)
        print(f"[probe] {kind}: {out[kind]}", file=sys.stderr, flush=True)

    c1, c2, c1w = out["chain1"]["us_per_step"], out["chain2"]["us_per_step"], out["chain1w"]["us_per_step"]
    verdict = (
        "latency-bound: second chain rides the shadow -> co-scheduling viable"
        if c2 < 1.35 * c1
        else "issue/ordering-bound: chains serialize -> co-scheduling buys nothing"
    )
    print(json.dumps({"metric": "chain_probe", "W": W, "L": L, "kinds": out,
                      "chain2_vs_chain1": round(c2 / c1, 2), "wide_vs_chain1": round(c1w / c1, 2),
                      "verdict": verdict}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
