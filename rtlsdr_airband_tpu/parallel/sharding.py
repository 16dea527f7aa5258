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
try:
    from jax import shard_map as _shard_map  # jax >= 0.4.35 (check_vma kwarg)

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.channelizer import MATMUL_PRECISION, make_frames, make_taps
from ..ops.demod import ChannelParams, DemodState, demod_block


def make_pipeline_mesh(devices=None, time_shards: int | None = None) -> Mesh:
    """Mesh with ('time', 'chan') axes over the given devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if time_shards is None:
        time_shards = 2 if n >= 4 and n % 2 == 0 else 1
    assert n % time_shards == 0
    return Mesh(devices.reshape(time_shards, n // time_shards), ("time", "chan"))


def pick_channel_axes(mesh: Mesh, C: int) -> tuple:
    """Mesh axes to shard the per-channel demod state over.  Channels spread
    over EVERY device when C divides the device count (the demod stage has
    zero cross-channel communication, so the time-axis devices shouldn't
    idle through it); smaller channel populations fall back to one axis, and
    indivisible ones (e.g. a single scan channel) replicate — correctness
    first, the channelizer stays time-sharded either way."""
    t, c = mesh.shape["time"], mesh.shape["chan"]
    if C % (t * c) == 0:
        return ("time", "chan")
    if C % c == 0:
        return ("chan",)
    if C % t == 0:
        return ("time",)
    return ()


def _channel_axis(shape: tuple, channel_dim: int) -> int | None:
    """Rightmost dim whose size equals the channel count (IQ-pair leaves are
    [..., C, 2], so scan from the right)."""
    for ax in range(len(shape) - 1, -1, -1):
        if shape[ax] == channel_dim:
            return ax
    return None


def channel_pspec(shape: tuple, channel_dim: int, axis: str | tuple = "chan") -> P:
    ax = _channel_axis(shape, channel_dim)
    if ax is None or axis == () or axis is None:
        return P()
    spec = [None] * len(shape)
    spec[ax] = axis
    return P(*spec)


def infer_channel_dim(tree) -> int:
    from collections import Counter

    leaves = [l for l in jax.tree.leaves(tree) if l.ndim > 0]
    return Counter(l.shape[-1] for l in leaves).most_common(1)[0][0]


def shard_last(mesh: Mesh, tree, axis: str = "chan", channel_dim: int | None = None):
    """Shard array leaves over their channel dimension (rightmost dim whose
    size equals the channel count; IQ-pair leaves [..., C, 2] shard on -2).

    Leaves with no channel-sized dim (e.g. the shared 257-entry sincos LUTs
    in ChannelParams) are replicated.  ``channel_dim`` defaults to the most
    common last-dim size across leaves.
    """
    if channel_dim is None:
        channel_dim = infer_channel_dim(tree)

    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, channel_pspec(leaf.shape, channel_dim, axis)))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree)


def channelize_time_sharded_parts(
    mesh: Mesh,
    x_body: jax.Array,  # [n_frames*hop, 2] f32 pairs, sharded P('time', None)
    x_tail: jax.Array,  # [fft_size-hop, 2] f32 pairs, replicated
    bins: jax.Array,
    window: jax.Array,
    *,
    hop: int,
    fft_size: int,
    n_frames: int,
    taps: tuple[jax.Array, jax.Array] | None = None,
):
    """Overlap-save channelizer sharded over the 'time' mesh axis.

    Each time shard processes n_frames/T frames; the fft_size-hop halo
    between neighbouring shards is exchanged over ICI with ppermute, the
    TPU-native equivalent of the reference's ring-buffer tail duplication
    (input-helpers.cpp:27-54).  The final shard's halo is the global tail
    ``x_tail`` (the stream look-ahead the framer appended).

    ``taps``: optional precomputed make_taps(bins, window) — streaming
    callers pass it so the [C, N] sincos is paid per retune, not per block.
    """
    T = mesh.shape["time"]
    assert n_frames % T == 0, (n_frames, T)
    local_frames = n_frames // T
    body = n_frames * hop
    halo = fft_size - hop
    assert body % T == 0

    def kernel(xb, xt, b, w, tp):
        # xb: [local_body, 2] this shard's IQ pairs; xt: [halo, 2] global tail
        i = jax.lax.axis_index("time")
        T_ = jax.lax.axis_size("time")
        # send my leading `halo` samples to my LEFT neighbour (it needs them
        # as its trailing halo); last shard uses the global tail instead
        head = jax.lax.slice_in_dim(xb, 0, halo, axis=0)
        recv = jax.lax.ppermute(head, "time", [((j + 1) % T_, j) for j in range(T_)])
        my_halo = jnp.where(i == T_ - 1, xt, recv)
        xloc = jnp.concatenate([xb, my_halo], axis=0)
        frames = make_frames(xloc, hop, fft_size, local_frames)  # [F, N, 2]
        tr, ti = tp if tp is not None else make_taps(b, w)
        fr, fi = frames[..., 0], frames[..., 1]
        dot = partial(jnp.dot, precision=MATMUL_PRECISION)
        yr = dot(fr, tr.T) - dot(fi, ti.T)
        yi = dot(fr, ti.T) + dot(fi, tr.T)
        return jnp.sqrt(yr * yr + yi * yi), jnp.stack([yr, yi], axis=-1)

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("time", None), P(None, None), P(), P(), P()),
        out_specs=(P("time", None), P("time", None, None)),
    )(x_body, x_tail, bins, window, taps)


def channelize_time_sharded(mesh: Mesh, x: jax.Array, bins: jax.Array, window: jax.Array, *, hop: int, fft_size: int, n_frames: int):
    """Whole-block wrapper over :func:`channelize_time_sharded_parts`:
    ``x`` is [n_frames*hop + (fft_size-hop), 2] with the global halo already
    appended by the framer."""
    body = n_frames * hop
    return channelize_time_sharded_parts(
        mesh, x[:body], x[body:], bins, window, hop=hop, fft_size=fft_size, n_frames=n_frames
    )


def make_sharded_pipeline_step(
    mesh: Mesh,
    *,
    hop: int,
    fft_size: int,
    n_frames: int,
    fm_quadri: bool = False,
    with_ctcss: bool = True,
    demod_backend: str = "xla",
    pallas_interpret: bool = False,
):
    """Build the jitted multi-chip block step: time-sharded overlap-save
    channelizer → all-to-all reshard → channel-sharded demod scan.

    Thin wrapper over the production implementation
    (runtime.pipeline._pipeline_block_impl with ``mesh`` set) so every parity
    test of this step exercises the exact code path the App's mesh-mode
    Pipeline dispatches.

    demod_backend='pallas' runs the Mosaic demod kernel per channel shard
    under an explicit shard_map (each device's shard is one independent
    kernel launch — the demod stage has zero cross-channel communication);
    'xla' (default) lets GSPMD partition the lax.scan path, which is what the
    CPU mesh dry-runs use.  pallas_interpret=True runs the kernel in Pallas
    interpret mode for CPU-mesh testing of the sharded-kernel deployment
    configuration."""
    from ..runtime.pipeline import _pipeline_block_impl

    body = n_frames * hop

    def step(x, bins, window, params: ChannelParams, state: DemodState):
        state, out = _pipeline_block_impl(
            (x[:body], x[body:]), bins, window, params, state,
            hop=hop, fft_size=fft_size, n_frames=n_frames,
            fm_quadri=fm_quadri, with_ctcss=with_ctcss,
            demod_backend=demod_backend, mesh=mesh, pallas_interpret=pallas_interpret,
        )
        return state, out["audio"], out["iq_out"], out["active"]

    return jax.jit(step)
