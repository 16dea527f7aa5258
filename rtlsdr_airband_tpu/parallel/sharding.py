"""Multi-chip sharding of the channelizer + demod pipeline.

The reference's only parallelism is pthreads in one process (SURVEY.md §2.5);
here the pipeline is laid out on a 2-D device mesh:

 - axis ``time``: the channelizer's frames are embarrassingly parallel over
   time except for the window overlap — each shard needs fft_size-hop
   trailing samples from its right neighbour.  ``channelize_time_sharded``
   runs under shard_map and exchanges that halo with ``lax.ppermute`` over
   ICI (overlap-save channelization).
 - axis ``chan``: everything after the channelizer is per-channel state
   recurrence — sharded over channels with no communication at all.  The
   [time-sharded] channelizer output is resharded to [channel-sharded] by one
   all-to-all that XLA/GSPMD inserts from the sharding constraints.

Multi-host: each host feeds its own device's time slice via
``jax.make_array_from_process_local_data``; the mesh spans hosts via
``jax.distributed`` (DCN between hosts, ICI within a slice).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.channelizer import make_frames, make_taps
from ..ops.demod import ChannelParams, DemodState, demod_block


def make_pipeline_mesh(devices=None, time_shards: int | None = None) -> Mesh:
    """Mesh with ('time', 'chan') axes over the given devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if time_shards is None:
        time_shards = 2 if n >= 4 and n % 2 == 0 else 1
    assert n % time_shards == 0
    return Mesh(devices.reshape(time_shards, n // time_shards), ("time", "chan"))


def shard_last(mesh: Mesh, tree, axis: str = "chan", channel_dim: int | None = None):
    """Shard array leaves over their last dimension (the channel dim).

    Leaves whose last dim is not the channel count (e.g. the shared 257-entry
    sincos LUTs in ChannelParams) are replicated.  ``channel_dim`` defaults to
    the most common last-dim size across leaves.
    """
    leaves = jax.tree.leaves(tree)
    if channel_dim is None:
        from collections import Counter

        channel_dim = Counter(l.shape[-1] for l in leaves if l.ndim > 0).most_common(1)[0][0]

    def put(leaf):
        if leaf.ndim > 0 and leaf.shape[-1] == channel_dim:
            s = NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + [axis])))
        else:
            s = NamedSharding(mesh, P())
        return jax.device_put(leaf, s)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree)


def channelize_time_sharded(mesh: Mesh, x: jax.Array, bins: jax.Array, window: jax.Array, *, hop: int, fft_size: int, n_frames: int):
    """Overlap-save channelizer sharded over the 'time' mesh axis.

    ``x`` is the full block input [n_frames*hop + (fft_size-hop)] (the global
    halo already appended by the framer).  Each time shard processes
    n_frames/T frames; the fft_size-hop halo between neighbouring shards is
    exchanged over ICI with ppermute, the TPU-native equivalent of the
    reference's ring-buffer tail duplication (input-helpers.cpp:27-54).
    """
    T = mesh.shape["time"]
    assert n_frames % T == 0
    local_frames = n_frames // T
    body = n_frames * hop  # samples excluding the final halo
    halo = fft_size - hop
    assert body % T == 0
    local_body = body // T

    x_body, x_tail = x[:body], x[body:]  # tail: [halo]

    def kernel(xb, xt, b, w):
        # xb: [local_body] this shard's samples; xt: [halo] global tail (replicated)
        i = jax.lax.axis_index("time")
        T_ = jax.lax.axis_size("time")
        # send my leading `halo` samples to my LEFT neighbour (it needs them
        # as its trailing halo); last shard uses the global tail instead
        head = jax.lax.slice_in_dim(xb, 0, halo, axis=0)
        recv = jax.lax.ppermute(head, "time", [((j + 1) % T_, j) for j in range(T_)])
        my_halo = jnp.where(i == T_ - 1, xt, recv)
        xloc = jnp.concatenate([xb, my_halo])
        frames = make_frames(xloc, hop, fft_size, local_frames)
        tr, ti = make_taps(b, w)
        fr, fi = jnp.real(frames), jnp.imag(frames)
        yr = fr @ tr.T - fi @ ti.T
        yi = fr @ ti.T + fi @ tr.T
        return jnp.sqrt(yr * yr + yi * yi), jax.lax.complex(yr, yi)

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("time"), P(), P(), P()),
        out_specs=(P("time", None), P("time", None)),
        check_rep=False,
    )(x_body, x_tail, bins, window)


def make_sharded_pipeline_step(mesh: Mesh, *, hop: int, fft_size: int, n_frames: int, fm_quadri: bool = False, with_ctcss: bool = True):
    """Build the jitted multi-chip block step: time-sharded overlap-save
    channelizer → all-to-all reshard → channel-sharded demod scan."""

    chan_last = lambda nd: NamedSharding(mesh, P(*([None] * (nd - 1) + ["chan"])))

    def step(x, bins, window, params: ChannelParams, state: DemodState):
        mags, iqs = channelize_time_sharded(mesh, x, bins, window, hop=hop, fft_size=fft_size, n_frames=n_frames)
        # reshard [time-sharded frames, C] -> [frames, chan-sharded C]:
        # GSPMD inserts the all-to-all over ICI from these constraints.
        mags = jax.lax.with_sharding_constraint(mags, NamedSharding(mesh, P(None, "chan")))
        iqs = jax.lax.with_sharding_constraint(iqs, NamedSharding(mesh, P(None, "chan")))
        state = jax.tree.map(lambda l: jax.lax.with_sharding_constraint(l, chan_last(l.ndim)), state)
        state, audio, iq_out, open_flags = demod_block(params, state, mags, iqs, fm_quadri=fm_quadri, with_ctcss=with_ctcss)
        return state, audio, iq_out, jnp.any(open_flags, axis=0)

    return jax.jit(step)
