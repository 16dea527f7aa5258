"""Cost-class channel grouping must be invisible to the user: the Pipeline
reorders channels internally (so the Pallas kernel's per-tile CTCSS gate
skips CTCSS-free tiles) and restores user order on every output in-jit.
This pins the invariant by comparing against a grouping-disabled pipeline."""

import numpy as np
import pytest

from rtlsdr_airband_tpu.ops.params import ChannelSpec, cost_group_permutation
from rtlsdr_airband_tpu.runtime.pipeline import Pipeline, PipelineConfig
from rtlsdr_airband_tpu.utils.siggen import am_carrier_iq, complex_noise

FS = 2_560_000


def _mixed_specs():
    # deliberately interleaved so the grouping permutation is nontrivial
    return [
        ChannelSpec(frequency=120_100_000, modulation="nfm", ctcss=100.0),
        ChannelSpec(frequency=120_300_000, modulation="am"),
        ChannelSpec(frequency=120_500_000, modulation="nfm", ctcss=123.0),
        ChannelSpec(frequency=120_700_000, modulation="am", bandwidth=6000, notch=1000.0, has_iq_outputs=True),
        ChannelSpec(frequency=119_500_000, modulation="nfm", bandwidth=8000),
        ChannelSpec(frequency=119_300_000, modulation="am"),
    ]


def _iq_bytes(secs=1.0):
    n = int(FS * secs)
    z = am_carrier_iq(FS, 300_000, n, carrier_ampl=0.4) + complex_noise(n, 0.01, seed=3)
    return z.astype(np.complex64)


def test_permutation_is_nontrivial_and_groups_ctcss():
    specs = _mixed_specs()
    order = cost_group_permutation(specs)
    assert not np.array_equal(order, np.arange(len(specs)))
    ct = np.array([s.ctcss > 0 for s in specs])[order]
    # all CTCSS channels contiguous (one run)
    idx = np.flatnonzero(ct)
    assert idx.size == 2 and idx[1] == idx[0] + 1


def test_grouping_preserves_user_order_outputs(monkeypatch):
    specs = _mixed_specs()
    x = _iq_bytes()

    def run(grouped: bool):
        if not grouped:
            import rtlsdr_airband_tpu.runtime.pipeline as plmod

            monkeypatch.setattr(
                plmod, "cost_group_permutation", lambda s: np.arange(len(s), dtype=np.int32)
            )
        else:
            monkeypatch.undo()
        pipe = Pipeline(PipelineConfig(sample_rate=FS, center_freq=120_000_000, fetch_open_flags=True), list(specs))
        outs = [
            {k: np.asarray(v) for k, v in out.items()}
            for out in pipe.feed(x)
        ]
        return pipe, outs

    pipe_g, outs_g = run(grouped=True)
    pipe_u, outs_u = run(grouped=False)
    assert not np.array_equal(pipe_g._order, np.arange(len(specs)))
    assert np.array_equal(pipe_u._order, np.arange(len(specs)))
    assert len(outs_g) == len(outs_u) > 0
    for og, ou in zip(outs_g, outs_u):
        for key in ("audio", "open_flags", "active", "signal_level", "noise_level", "iq_out"):
            np.testing.assert_array_equal(og[key], ou[key], err_msg=key)


def test_grouping_survives_checkpoint_roundtrip(tmp_path):
    specs = _mixed_specs()
    x = _iq_bytes()
    half = x.shape[0] // 2

    pipe = Pipeline(PipelineConfig(sample_rate=FS, center_freq=120_000_000, fetch_open_flags=True), list(specs))
    a1 = [np.asarray(o["audio"]) for o in pipe.feed(x[:half])]
    pipe.save_state(str(tmp_path / "ckpt.npz"))
    a2 = [np.asarray(o["audio"]) for o in pipe.feed(x[half:])]

    pipe2 = Pipeline(PipelineConfig(sample_rate=FS, center_freq=120_000_000), list(specs))
    pipe2.load_state(str(tmp_path / "ckpt.npz"))
    assert np.array_equal(pipe2.user_bins, pipe.user_bins)
    a2r = [np.asarray(o["audio"]) for o in pipe2.feed(x[half:])]
    assert len(a2r) == len(a2)
    for b1, b2 in zip(a2, a2r):
        np.testing.assert_array_equal(b1, b2)
