"""Worker process for the multi-host CPU-mesh test (run by
tests/test_multihost.py, one instance per simulated host).

Each process joins a 2-process jax.distributed cluster with 2 virtual CPU
devices, builds the global ('time', 'chan') mesh (2 time x 2 chan), ingests
only its own time slice of a deterministic IQ scene, runs the sharded
pipeline step on global arrays, and checks the audio channels it holds
against a locally computed single-process reference.  Exits 0 on match.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coord = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = 2

    import numpy as np

    # force CPU before jax initializes (the env pins an axon TPU platform)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from rtlsdr_airband_tpu.parallel import multihost
    from rtlsdr_airband_tpu.parallel.sharding import make_sharded_pipeline_step, replicate, shard_last
    from rtlsdr_airband_tpu.models.flagship import build_flagship
    from rtlsdr_airband_tpu.runtime.pipeline import pipeline_block
    from jax.sharding import NamedSharding, PartitionSpec as P

    multihost.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4

    W, C = 128, 4
    kw, (x, bins, window, params, state) = build_flagship(n_channels=C, wave_batch=W)
    hop, N = kw["hop"], kw["fft_size"]

    mesh = multihost.global_mesh(time_shards=2)
    step = make_sharded_pipeline_step(mesh, hop=hop, fft_size=N, n_frames=W, with_ctcss=True)

    # per-host ingest: only my time slice (plus tail halo if I own the last shard)
    x_np = np.asarray(x)
    body = W * hop
    halo = N - hop
    ranges = multihost.host_input_range(mesh, n_frames=W, hop=hop, fft_size=N)
    assert ranges, "every process should own at least one time shard"
    local = {}
    T = mesh.shape["time"]
    local_body = body // T
    owns_tail = False
    for off, blen, halo_len in ranges:
        local[off // local_body] = x_np[off : off + blen]
        owns_tail |= halo_len > 0
    # only the owner of the stream end ingests the tail; others receive it
    # via the broadcast inside make_global_input
    tail = x_np[body:] if owns_tail else None
    xg = multihost.make_global_input(mesh, local, tail, n_frames=W, hop=hop, halo=halo)

    args = (xg, replicate(mesh, bins), replicate(mesh, window), shard_last(mesh, params), shard_last(mesh, state))
    st, audio, iq_out, active = step(*args)

    # single-process reference on full local data
    _st, ref = jax.jit(lambda *a: pipeline_block(*a, **kw))(x, bins, window, params, state)
    ref_audio = np.asarray(ref["audio"])

    ok = True
    n_checked = 0
    for cslice, data in multihost.local_audio_shards(audio):
        want = ref_audio[:, cslice]
        d = np.abs(data - want).max()
        ok &= d < 1e-5
        n_checked += 1
    print(f"[proc {pid}] checked {n_checked} audio shards, ok={ok}", flush=True)
    # make sure both processes finish before teardown
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")
    return 0 if ok and n_checked > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
