"""Multi-chip sharding semantics on the virtual 8-device CPU mesh:
the time-sharded overlap-save channelizer + channel-sharded demod must
produce results identical to the unsharded single-device path."""

import jax
import numpy as np
import pytest

from rtlsdr_airband_tpu.models.flagship import build_flagship, build_flagship_stream
from rtlsdr_airband_tpu.parallel.sharding import (
    channelize_time_sharded,
    make_pipeline_mesh,
    make_sharded_pipeline_step,
    replicate,
    shard_last,
)
from rtlsdr_airband_tpu.runtime.pipeline import channelize_block, pipeline_block


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_pipeline_mesh(jax.devices()[:8])


def test_mesh_shape(mesh):
    assert mesh.shape == {"time": 2, "chan": 4}


def test_time_sharded_channelizer_matches_unsharded(mesh):
    W, C = 128, 16
    bk, (x, bins, window, params, state) = build_flagship(n_channels=C, wave_batch=W)
    hop, N = bk["hop"], bk["fft_size"]

    m_ref, z_ref = channelize_block(x, bins, window, hop=hop, fft_size=N, n_frames=W)
    xs, bs, ws = replicate(mesh, x), replicate(mesh, bins), replicate(mesh, window)
    m_sh, z_sh = channelize_time_sharded(mesh, xs, bs, ws, hop=hop, fft_size=N, n_frames=W)

    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_ref), rtol=1e-6, atol=1e-6)


def test_sharded_step_matches_unsharded_pipeline(mesh):
    W, C = 128, 16
    bk, (x, bins, window, params, state) = build_flagship(n_channels=C, wave_batch=W)

    # unsharded
    st_ref, out_ref = pipeline_block(
        x, bins, window, params, state,
        hop=bk["hop"], fft_size=bk["fft_size"], n_frames=W,
        fm_quadri=bk["fm_quadri"], with_ctcss=bk["with_ctcss"],
    )

    step = make_sharded_pipeline_step(
        mesh, hop=bk["hop"], fft_size=bk["fft_size"], n_frames=W,
        fm_quadri=bk["fm_quadri"], with_ctcss=bk["with_ctcss"],
    )
    st_sh, audio, iq_out, active = step(
        replicate(mesh, x), replicate(mesh, bins), replicate(mesh, window),
        shard_last(mesh, params), shard_last(mesh, state),
    )

    np.testing.assert_allclose(np.asarray(audio), np.asarray(out_ref["audio"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(iq_out), np.asarray(out_ref["iq_out"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(active), np.asarray(out_ref["active"]))
    # carried state parity — integer state must be exact
    for name in ("cur", "nxt", "delay", "open_count", "sample_count"):
        np.testing.assert_array_equal(np.asarray(getattr(st_sh, name)), np.asarray(getattr(st_ref, name)), err_msg=name)
    np.testing.assert_allclose(np.asarray(st_sh.noise_floor), np.asarray(st_ref.noise_floor), rtol=1e-6)


INT_STATE = ("cur", "nxt", "delay", "low_signal_count", "sample_count",
             "open_count", "flappy_count", "recent_open_count", "closed_sample_count")


def test_sharded_active_scene_opens_closes_and_retunes(mesh):
    """The hard case VERDICT r1 flagged: squelch must actually OPEN and CLOSE
    across the all-to-all reshard, with carriers in different 'chan' shards
    (plain AM, NFM+CTCSS, filtered AM), a mid-stream retune (new bins array,
    same compiled step), and bit-exact integer/CTCSS state vs unsharded on
    every block."""
    C, K = 16, 12
    bk, bins, window, params, state, xbl, hot = build_flagship_stream(n_channels=C, n_blocks=K)
    W = bk["n_frames"]

    step = make_sharded_pipeline_step(
        mesh, hop=bk["hop"], fft_size=bk["fft_size"], n_frames=W,
        fm_quadri=bk["fm_quadri"], with_ctcss=bk["with_ctcss"],
    )
    ws, ps = replicate(mesh, window), shard_last(mesh, params)
    st_sh, st_ref = shard_last(mesh, state), state

    # mid-stream retune: from block 4, a quiet channel (device idx 2) moves
    # onto the AM carrier's bin — bins is a plain runtime arg, no recompile
    bins2 = np.asarray(bins).copy()
    quiet = next(i for i in range(C) if i not in hot)
    bins2[quiet] = np.asarray(bins)[hot[0]]
    bins2 = jax.numpy.asarray(bins2)

    ever_active = np.zeros(C, bool)
    for k, x in enumerate(xbl):
        b = bins if k < 4 else bins2
        st_sh, audio, _iq, act = step(replicate(mesh, x), replicate(mesh, b), ws, ps, st_sh)
        st_ref, out = pipeline_block(x, b, window, params, st_ref, **bk)
        np.testing.assert_allclose(np.asarray(audio), np.asarray(out["audio"]), rtol=1e-5, atol=1e-6, err_msg=f"block {k}")
        np.testing.assert_array_equal(np.asarray(act), np.asarray(out["active"]), err_msg=f"block {k}")
        for name in INT_STATE:
            np.testing.assert_array_equal(
                np.asarray(getattr(st_sh, name)), np.asarray(getattr(st_ref, name)), err_msg=f"block {k}: {name}"
            )
        for bank in ("fast", "slow"):
            for f in ("count", "enough", "has_tone", "found", "not_found"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(getattr(st_sh, bank), f)),
                    np.asarray(getattr(getattr(st_ref, bank), f)),
                    err_msg=f"block {k}: {bank}.{f}",
                )
        ever_active |= np.asarray(act)

    # every carrier channel opened, including the CTCSS-gated one...
    assert ever_active[hot].all(), (hot, np.flatnonzero(ever_active))
    # ...and the retuned channel picked up the carrier after the bins switch
    assert ever_active[quiet]
    # carriers span >=3 of the 4 channel shards
    shard_of = np.flatnonzero(ever_active) // (C // mesh.shape["chan"])
    assert len(set(shard_of.tolist())) >= 3, shard_of
    # squelch CLOSED again after the gate-off (open AND close both exercised)
    assert np.asarray(st_ref.open_count)[hot[0]] >= 1
    assert not np.asarray(st_ref.cur)[hot[0]]  # CLOSED == 0


def test_sharded_step_multi_block_state_carry(mesh):
    W, C = 128, 16
    bk, (x, bins, window, params, state) = build_flagship(n_channels=C, wave_batch=W)
    step = make_sharded_pipeline_step(
        mesh, hop=bk["hop"], fft_size=bk["fft_size"], n_frames=W,
        fm_quadri=bk["fm_quadri"], with_ctcss=bk["with_ctcss"],
    )
    xs = replicate(mesh, x)
    bs, ws = replicate(mesh, bins), replicate(mesh, window)
    ps = shard_last(mesh, params)
    st = shard_last(mesh, state)
    st_ref = state
    for k in range(3):
        st, audio_sh, _, _ = step(xs, bs, ws, ps, st)
        st_ref, out_ref = pipeline_block(
            x, bins, window, params, st_ref,
            hop=bk["hop"], fft_size=bk["fft_size"], n_frames=W,
            fm_quadri=bk["fm_quadri"], with_ctcss=bk["with_ctcss"],
        )
        np.testing.assert_allclose(np.asarray(audio_sh), np.asarray(out_ref["audio"]), rtol=1e-5, atol=1e-6, err_msg=f"block {k}")
