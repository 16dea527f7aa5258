"""Debug driver: JAX demod_block vs NumPy refmodel, exact comparison."""

import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from rtlsdr_airband_tpu.constants import AGC_EXTRA
from rtlsdr_airband_tpu.ops.demod import demod_block
from rtlsdr_airband_tpu.ops.params import ChannelSpec, make_channel_params, init_demod_state
from rtlsdr_airband_tpu.refmodel.channel_ref import (
    ChannelRef,
    ChannelRefConfig,
    ChannelizerRef,
    DeviceRef,
    bin_for_freq,
)
from rtlsdr_airband_tpu.utils.siggen import SignalGen, am_carrier_iq, nfm_carrier_iq, complex_noise

FS = 2_560_000
N = 512
CENTER = 120_000_000


def build_scene(wr, specs, dur=1.0, seed=0):
    n = int(FS * dur)
    iq = complex_noise(n, 0.02, seed=seed)
    rng = np.random.default_rng(seed + 1)
    for i, s in enumerate(specs):
        gen = SignalGen(wr, seed=seed + i).add_tone(700.0 + 150 * i, 0.5).add_noise(0.02)
        if s.ctcss > 0:
            gen.add_tone(s.ctcss, 0.25)
        audio = gen.render(int(wr * dur))
        # on/off keying: signal present in middle 60%
        if s.modulation == "am":
            c = am_carrier_iq(FS, s.frequency - CENTER, n, audio=audio, carrier_ampl=0.35, mod_index=0.8, audio_rate=wr)
        else:
            c = nfm_carrier_iq(FS, s.frequency - CENTER, n, audio=audio, deviation_hz=2500.0, carrier_ampl=0.35, audio_rate=wr)
        gate = np.zeros(n, np.float32)
        a, b = int(n * 0.15), int(n * 0.8)
        gate[a:b] = 1.0
        iq = iq + c * gate
    return iq.astype(np.complex64)


def run_compare(wr, specs_kw, dur=1.0, ctcss_tone=None):
    specs = [ChannelSpec(**kw) for kw in specs_kw]
    C = len(specs)
    bins = np.array([bin_for_freq(s.frequency, CENTER, FS, N) for s in specs], np.int32)
    iq_scene = build_scene(wr, specs, dur)

    chanzr = ChannelizerRef(N, FS, wr, bins)
    mags, iqs = chanzr.push(iq_scene)  # [C, G]
    G = mags.shape[1]
    W, A = wr // 8, AGC_EXTRA
    n_blocks = (G - A) // W
    print(f"frames={G} blocks={n_blocks} C={C}")

    # --- refmodel
    refchs = []
    for kw in specs_kw:
        cfg = ChannelRefConfig(**{k: v for k, v in kw.items() if k in ChannelRefConfig.__dataclass_fields__})
        refchs.append(ChannelRef(cfg, wr, N, FS, CENTER))
    dev = DeviceRef(refchs, wr)
    ref_batches = dev.push(mags, iqs)
    ref_audio = np.concatenate([b[0] for b in ref_batches], axis=1)  # [C, n_blocks*W]
    ref_iqout = np.concatenate([b[1] for b in ref_batches], axis=1)

    # --- jax kernel
    params = make_channel_params(specs, wave_rate=wr, sample_rate=FS, center_freq=CENTER, fft_size=N)
    state = init_demod_state(C, mags[:, :A].T, np.stack([iqs[:, :A].T.real, iqs[:, :A].T.imag], -1).astype(np.float32))
    audio_blocks, iq_blocks = [], []
    for k in range(n_blocks):
        lo = A + k * W
        mb = jnp.asarray(mags[:, lo : lo + W].T)
        _z = iqs[:, lo : lo + W].T
        zb = jnp.asarray(np.stack([_z.real, _z.imag], -1).astype(np.float32))
        state, audio, iqo, open_f = demod_block(params, state, mb, zb)
        audio_blocks.append(np.asarray(audio).T)
        iq_blocks.append(np.asarray(iqo).T)
    jax_audio = np.concatenate(audio_blocks, axis=1)
    jax_iqout = np.concatenate(iq_blocks, axis=1)

    n = min(ref_audio.shape[1], jax_audio.shape[1])
    for c in range(C):
        ra, ja = ref_audio[c, :n], jax_audio[c, :n]
        d = np.abs(ra - ja)
        nz = (ra != 0) | (ja != 0)
        mism = (ra != 0) != (ja != 0)
        print(f"ch{c}: max|d|={d.max():.3e} mean|ref|={np.abs(ra).mean():.3e} nonzero_frac ref={np.mean(ra!=0):.3f} jax={np.mean(ja!=0):.3f} gate_mismatch={mism.mean():.4f}")
        if d.max() > 1e-4:
            bad = np.argmax(d)
            print(f"   first big diff at {np.argmax(d>1e-4)}, worst at {bad}: ref={ra[bad]} jax={ja[bad]}")
        diq = np.abs(ref_iqout[c, :n] - jax_iqout[c, :n])
        print(f"   iq_out max|d|={diq.max():.3e}")
    # final squelch states
    for c, rch in enumerate(refchs):
        sq = rch.squelch
        print(f"ch{c} ref: cur={sq.current_state} open_count={sq.open_count} nf={sq.noise_floor:.4f} sc={sq.sample_count}")
        print(f"ch{c} jax: cur={int(state.cur[c])} open_count={int(state.open_count[c])} nf={float(state.noise_floor[c]):.4f} sc={int(state.sample_count[c])}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "am"
    if which == "am":
        run_compare(8000, [
            dict(frequency=120_400_000, modulation="am"),
            dict(frequency=120_700_000, modulation="am", ampfactor=1.2),
        ])
    elif which == "amlp":
        run_compare(8000, [
            dict(frequency=120_400_000, modulation="am", bandwidth=6000, notch=1000.0, has_iq_outputs=True),
            dict(frequency=120_700_000, modulation="am", squelch_threshold_dbfs=-40.0),
        ])
    elif which == "nfm":
        run_compare(16000, [
            dict(frequency=120_300_000, modulation="nfm", bandwidth=8000),
            dict(frequency=120_900_000, modulation="nfm"),
        ])
    elif which == "ctcss":
        run_compare(16000, [
            dict(frequency=120_300_000, modulation="nfm", ctcss=100.0),
        ])
