"""Pipeline DSP-state checkpoint/resume: a restarted pipeline must produce
bit-identical audio to one that never stopped (the reference has no DSP
checkpointing — its recovery drops audio; SURVEY.md §5)."""

import numpy as np

from rtlsdr_airband_tpu.ops.params import ChannelSpec
from rtlsdr_airband_tpu.runtime.pipeline import Pipeline, PipelineConfig
from rtlsdr_airband_tpu.utils.siggen import am_carrier_iq, complex_noise

FS, CENTER = 2_560_000, 120_000_000


def make_pipe():
    cfg = PipelineConfig(sample_rate=FS, center_freq=CENTER, wave_rate=8000, sample_format="f32c")
    return Pipeline(cfg, [
        ChannelSpec(frequency=120_400_000, modulation="am"),
        ChannelSpec(frequency=120_700_000, modulation="nfm", ctcss=100.0),
    ])


def test_checkpoint_resume_bit_identical(tmp_path):
    n = int(FS * 1.2)
    z = (am_carrier_iq(FS, 400_000, n, carrier_ampl=0.35) + complex_noise(n, 0.02, 0)).astype(np.complex64)
    half = n // 2

    # continuous run
    p1 = make_pipe()
    audio1 = [np.asarray(out["audio"]) for out in p1.feed(z)]

    # run to half, checkpoint, resume in a fresh pipeline, feed the rest
    p2 = make_pipe()
    audio2 = [np.asarray(out["audio"]) for out in p2.feed(z[:half])]
    ckpt = tmp_path / "dsp_state.npz"
    p2.save_state(str(ckpt))

    p3 = make_pipe()
    p3.load_state(str(ckpt))
    assert p3.blocks_processed == p2.blocks_processed
    audio2 += [np.asarray(out["audio"]) for out in p3.feed(z[half:])]

    a1 = np.concatenate(audio1, axis=0)
    a2 = np.concatenate(audio2, axis=0)
    assert a1.shape == a2.shape
    np.testing.assert_array_equal(a1, a2)
