"""CTCSS E2E gap isolation experiment (round-3 verdict #5).

Question: is the nfm_ctcss channel's residual disagreement with the
reference binary (33 dB SNR, 0.988 gating vs >129 dB / 1.0 elsewhere)
pure FAST-detector marginality flipping on channelizer f32 roundoff, or a
semantic bug in our demod?

Method: rerun the SAME binary capture against our pipeline with
channelizer variants of increasing numerical fidelity:

  1. matmul @ Precision.HIGH     (production default — the baseline gap)
  2. fft (jnp.fft batched FFT)   (structurally the binary's algorithm)
  3. matmul @ Precision.HIGHEST  (f32_6x — near-exact DFT)

If the marginality claim is right, gating should *move* between variants
(the near-tie windows flip with any numerics change) and converge toward
1.0 as the channelizer gets closer to the binary's own per-frame f32 FFT;
if gating is invariant across variants, the gap would be semantic and a
bug hunt is warranted.  Results recorded in E2E_GOLDEN.md.

Usage: python scripts/e2e_ctcss_isolation.py  (CPU, ~3 min)
"""

import os
import sys
import tempfile

import jax

# NOTE: the JAX_PLATFORMS *env var* is silently ignored in this environment
# (the axon plugin pins the platform; tests/conftest.py documents the same
# quirk) — only jax.config.update takes effect.  ISO_PLATFORM=axon reruns
# the experiment on the TPU.
jax.config.update("jax_platforms", os.environ.get("ISO_PLATFORM", "cpu"))

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests", "golden"))

from e2e_ref import CHANNELS, compare, compare_guarded, make_scene, run_reference, run_tpu  # noqa: E402

VARIANTS = [
    ("matmul_HIGH (production)", dict(channelizer="matmul", precision="HIGH")),
    ("fft", dict(channelizer="fft", precision="HIGH")),
    ("matmul_HIGHEST", dict(channelizer="matmul", precision="HIGHEST")),
]


def main() -> None:
    print(f"jax backend: {jax.default_backend()}", flush=True)
    workdir = tempfile.mkdtemp(prefix="ctcss_iso_")
    u8 = make_scene()
    ref = run_reference(u8, workdir, speedup=2)
    names = [c.name for c in CHANNELS if c.ctcss > 0] + ["nfm"]  # nfm = control
    rows = []
    for label, kw in VARIANTS:
        tpu = run_tpu(u8, **kw)
        for name in names:
            c = compare(ref[name], tpu[name])
            g = compare_guarded(ref[name], tpu[name]) if name != "nfm" else None
            rows.append((label, name, c, g))
            print(
                f"{label:26s} {name:18s} snr={c.snr_db:7.2f} dB  gating={c.gating_agreement:.5f}"
                + (f"  guarded: snr={g.snr_db:.2f} gating={g.gating_agreement:.5f}" if g else ""),
                flush=True,
            )
    # disagreement-sample counts make the movement explicit
    print("\nper-variant disagreement (1 - gating) x n samples:")
    for label, name, c, _g in rows:
        if name != "nfm":
            print(f"  {label:26s} {name:18s} ~{round((1 - c.gating_agreement) * c.n)} samples of {c.n}")


if __name__ == "__main__":
    main()
