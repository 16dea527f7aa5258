#!/usr/bin/env python
"""Production multi-host runner: every host of a pod slice runs this with the
same config + coordinator, ingests only ITS time slices of the IQ stream,
executes the chained sharded pipeline on the global mesh, and drains the
audio channels IT holds into per-host WAV files.

    # host 0                                   # host 1
    python scripts/run_multihost.py \\         python scripts/run_multihost.py \\
        --coordinator 10.0.0.1:9999 \\             --coordinator 10.0.0.1:9999 \\
        --nproc 2 --pid 0 \\                       --nproc 2 --pid 1 \\
        -c airband.conf --outdir /data/h0          -c airband.conf --outdir /data/h1

CPU smoke test (2 processes, 2 virtual devices each):

    python scripts/run_multihost.py --coordinator 127.0.0.1:9999 --nproc 2 \\
        --pid {0,1} --cpu-devices 2 -c examples/multichannel.conf --outdir ...

Reference analog: the reference is a single process
(/root/reference/src/rtl_airband.cpp) — this is the TPU build's scale-out
path (SURVEY.md §2.5 / §7 layer 5); the sharding semantics are verified
bit-exact by tests/test_multihost.py and tests/test_mesh_app.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True, help="host:port of process 0")
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--cpu-devices", type=int, default=None, help="force N virtual CPU devices (testing)")
    ap.add_argument("--time-shards", type=int, default=None)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--outdir", required=True, help="per-host audio output directory (WAV per channel)")
    ap.add_argument("--chunk", type=int, default=4, help="blocks per chained dispatch")
    args = ap.parse_args()

    if args.cpu_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np

    from rtlsdr_airband_tpu.parallel import multihost

    multihost.initialize(args.coordinator, args.nproc, args.pid, local_device_count=args.cpu_devices)

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    from rtlsdr_airband_tpu.io.wav import WavWriter
    from rtlsdr_airband_tpu.ops.params import init_demod_state
    from rtlsdr_airband_tpu.runtime.config import load_config
    from rtlsdr_airband_tpu.runtime.pipeline import Pipeline, PipelineConfig, pipeline_chain
    from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    cfg = load_config(args.config)
    d = cfg.devices[0]
    if d.type != "file" or not d.filepath:
        print("multihost runner needs a file-input device (shared recording visible on every host)", file=sys.stderr)
        return 2
    wave_rate = cfg.resolved_wave_rate()

    mesh = multihost.global_mesh(time_shards=args.time_shards)
    if args.pid == 0:
        print(f"mesh: {dict(mesh.shape)} over {mesh.size} device(s), {jax.process_count()} host(s)", flush=True)

    # build the (mesh-mode) pipeline config; the Pipeline here is used for
    # its params/bins/taps/state construction — the streaming loop below
    # drives pipeline_chain directly with per-host global arrays
    pcfg = PipelineConfig(
        sample_rate=d.sample_rate,
        center_freq=d.centerfreq,
        fft_size=cfg.fft_size,
        wave_rate=wave_rate,
        sample_format="f32c",
        demod_backend=cfg.demod_backend,
        mesh=mesh,
    )
    specs = [ch.spec_for(0) for ch in d.channels]
    pipe = Pipeline(pcfg, specs)
    C, W, hop, N = pipe.C, pipe.W, pipe.hop, pipe.N
    body, halo = W * hop, N - hop
    from rtlsdr_airband_tpu.constants import AGC_EXTRA

    from rtlsdr_airband_tpu.ops.sampleconv import SampleFormat, decode_iq

    raw = open(d.filepath, "rb").read()
    z = decode_iq(raw, SampleFormat(d.sample_format), d.fullscale or 127.5)  # [n, 2]

    # prime (every host computes the same tiny prefix)
    from rtlsdr_airband_tpu.runtime.pipeline import channelize_block

    import jax.numpy as jnp

    prime_len = (AGC_EXTRA - 1) * hop + N
    mags, iqs = channelize_block(jnp.asarray(z[:prime_len]), pipe.bins, pipe.window, hop=hop, fft_size=N, n_frames=AGC_EXTRA)
    state = pipe._shard_chan(init_demod_state(C, mags, iqs))
    z = z[AGC_EXTRA * hop :]

    ranges = multihost.host_input_range(mesh, n_frames=W, hop=hop, fft_size=N)
    T = mesh.shape["time"]
    local_body = body // T
    owns_tail = any(h > 0 for _, _, h in ranges)

    writers = {}
    os.makedirs(args.outdir, exist_ok=True)

    K = max(1, args.chunk)
    n_blocks_total = 0
    while len(z) >= K * body + halo:
        local = {}
        for off, blen, _h in ranges:
            local[off // local_body] = np.stack([z[j * body + off : j * body + off + blen] for j in range(K)])
        tails = np.stack([z[(j + 1) * body : (j + 1) * body + halo] for j in range(K)]) if owns_tail else None
        xg = multihost.make_global_chain_input(mesh, local, tails, k_blocks=K, n_frames=W, hop=hop, halo=halo)
        state, packed = pipeline_chain(
            xg, pipe.bins, pipe.window, pipe.params, state,
            k_blocks=K, hop=hop, fft_size=N, n_frames=W,
            fm_quadri=pcfg.fm_quadri, with_ctcss=pipe.any_ctcss, with_iq=False,
            demod_backend=cfg.demod_backend, mesh=mesh, inv_perm=pipe._inv_perm, taps=pipe._taps,
        )
        # per-host drain: only the channels this host's devices hold
        for cslice, data in multihost.local_audio_shards(packed["audio"]):  # [K, W, Clocal]
            for ci in range(cslice.start, cslice.stop):
                if ci not in writers:
                    writers[ci] = WavWriter(os.path.join(args.outdir, f"ch{ci:04d}.wav"), wave_rate)
                writers[ci].write_float(data[:, :, ci - cslice.start].reshape(-1))
        z = z[K * body :]
        n_blocks_total += K
        if args.pid == 0 and n_blocks_total % (4 * K) == 0:
            act = np.asarray(packed["active"]).any(axis=0)
            print(f"[{n_blocks_total} blocks] active={np.flatnonzero(act).tolist()}", flush=True)

    for w in writers.values():
        w.close()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")
    print(f"[proc {args.pid}] wrote {len(writers)} channel WAV(s), {n_blocks_total} blocks", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
