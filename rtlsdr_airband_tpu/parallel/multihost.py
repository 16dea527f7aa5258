"""Multi-host (pod-slice) execution scaffolding.

The reference is a single process (SURVEY.md §2.5); scaling past one TPU host
uses the standard JAX multi-controller recipe:

 - every host calls :func:`initialize` (``jax.distributed``) with the same
   coordinator address; the global mesh then spans all hosts' devices —
   collectives ride ICI within a slice and DCN across hosts;
 - each host ingests only ITS time slice of the IQ stream
   (:func:`host_input_range` says which raw samples it needs, including the
   overlap-save halo) and assembles the global block with
   :func:`make_global_input` (``jax.make_array_from_process_local_data``);
 - the jitted sharded step (parallel.sharding.make_sharded_pipeline_step)
   runs on global arrays; each host's sinks drain the audio channels it
   holds (``addressable_shards``).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import make_pipeline_mesh


def initialize(coordinator_address: str, num_processes: int, process_id: int, local_device_count: int | None = None) -> None:
    """Join the multi-controller cluster. Call before any other jax use.

    local_device_count forces N virtual CPU devices per process (testing on
    CPU meshes without a pod)."""
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={local_device_count}").strip()
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def global_mesh(time_shards: int | None = None) -> Mesh:
    """('time', 'chan') mesh over every device of every host."""
    return make_pipeline_mesh(jax.devices(), time_shards=time_shards)


def host_input_range(mesh: Mesh, *, n_frames: int, hop: int, fft_size: int) -> list[tuple[int, int, int]]:
    """Raw-IQ sample ranges this PROCESS must ingest, as
    ``(global_offset, body_len, halo_len)`` per time shard it owns.

    The sharded channelizer consumes x as [body | final halo] with the body
    split over the 'time' axis; a shard's input block is its body slice plus
    fft_size-hop look-ahead samples (fetched from the next shard over ICI by
    ppermute, so the HOST only needs to provide the body — the halo entry is
    the extra tail only the LAST shard ingests)."""
    T = mesh.shape["time"]
    assert n_frames % T == 0
    body = n_frames * hop
    local_body = body // T
    halo = fft_size - hop
    out = []
    mesh_devs = np.asarray(mesh.devices)
    for t in range(T):
        row_devices = mesh_devs[t].ravel().tolist()
        if any(d.process_index == jax.process_index() for d in row_devices):
            out.append((t * local_body, local_body, halo if t == T - 1 else 0))
    return out


@jax.jit
def _concat_body_tail(a, b):
    return jax.numpy.concatenate([a, b], axis=0)


def make_global_input(mesh: Mesh, local_body_slices: dict[int, np.ndarray], tail: np.ndarray | None, *, n_frames: int, hop: int, halo: int) -> jax.Array:
    """Assemble the global [body+halo, 2] input block from per-host pieces.

    local_body_slices maps time-shard index -> this host's [local_body, 2]
    IQ pairs (the shards :func:`host_input_range` assigned to this process).
    ``tail`` is the final ``halo`` = fft_size-hop look-ahead samples; only
    the process whose ranges included a nonzero halo_len ingests it (it owns
    the end of the stream) — everyone else passes ``tail=None`` and receives
    it here via a one-to-all broadcast before it is replicated.  Returns the
    global x ready for the sharded step, which slices body/tail inside jit."""
    from jax.experimental import multihost_utils

    body = n_frames * hop
    shards = sorted(local_body_slices.items())
    local = np.concatenate([s for _, s in shards], axis=0) if shards else np.zeros((0, 2), np.float32)
    body_arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("time", None)), local, global_shape=(body, 2)
    )
    if tail is None:
        tail_local = np.zeros((halo, 2), np.float32)
        is_source = False
    else:
        tail_local = np.asarray(tail, np.float32)
        assert tail_local.shape == (halo, 2), tail_local.shape
        is_source = True
    if jax.process_count() > 1:
        tail_local = np.asarray(multihost_utils.broadcast_one_to_all(tail_local, is_source=is_source))
    tail_arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), tail_local, global_shape=(halo, 2)
    )
    return _concat_body_tail(body_arr, tail_arr)


def make_global_chain_input(
    mesh: Mesh,
    local_bodies: dict[int, np.ndarray],
    tails: np.ndarray | None,
    *,
    k_blocks: int,
    n_frames: int,
    hop: int,
    halo: int,
):
    """Per-host ingest for the CHAINED production dispatch
    (runtime.pipeline.pipeline_chain with mesh set): assemble the stacked
    (bodies, tails) global arrays from per-host pieces.

    local_bodies maps time-shard index -> this host's [k_blocks, local_body,
    2] IQ pairs (or [k_blocks, 2*local_body] raw) for the shards
    :func:`host_input_range` assigned to this process; ``tails`` is
    [k_blocks, halo, 2] f32 pairs from the process owning the stream end
    (halo_len > 0 in its ranges), ``None`` elsewhere — broadcast to all.

    Returns (bodies, tails) ready to pass as ``x`` to pipeline_chain.
    """
    from jax.experimental import multihost_utils

    body = n_frames * hop
    shards = sorted(local_bodies.items())
    raw = shards and shards[0][1].ndim == 2 and shards[0][1].shape[-1] != 2
    if shards:
        local = np.concatenate([s for _, s in shards], axis=1)
    else:
        local = np.zeros((k_blocks, 0) if raw else (k_blocks, 0, 2), np.float32)
    gshape = (k_blocks, 2 * body) if raw else (k_blocks, body, 2)
    spec = P(None, "time") if raw else P(None, "time", None)
    bodies = jax.make_array_from_process_local_data(NamedSharding(mesh, spec), local, global_shape=gshape)
    if tails is None:
        t_local = np.zeros((k_blocks, halo, 2), np.float32)
        is_source = False
    else:
        t_local = np.asarray(tails, np.float32)
        assert t_local.shape == (k_blocks, halo, 2), t_local.shape
        is_source = True
    if jax.process_count() > 1:
        t_local = np.asarray(multihost_utils.broadcast_one_to_all(t_local, is_source=is_source))
    t_arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P()), t_local, global_shape=t_local.shape)
    return bodies, t_arr


def local_audio_shards(audio: jax.Array):
    """Yield (channel_slice, ndarray) for the audio channels this host holds
    ([W, C] or chained [K, W, C] channel-sharded output) — what this host's
    sinks should drain."""
    seen = set()
    for shard in audio.addressable_shards:
        idx = shard.index[-1]
        key = (idx.start, idx.stop)
        if key in seen:  # audio is replicated over 'time' rows of the mesh
            continue
        seen.add(key)
        yield idx, np.asarray(shard.data)
