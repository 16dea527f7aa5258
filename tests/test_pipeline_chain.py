"""Multi-block chained dispatch + on-device raw decode: the production
throughput path (pipeline_chain / Pipeline.chunk_blocks/async_depth) must be
bit-identical to the single-block synchronous path, and the on-device
decode_raw_iq must match the host decoder for every sample format."""

import numpy as np
import pytest

from rtlsdr_airband_tpu.ops.params import ChannelSpec
from rtlsdr_airband_tpu.ops.sampleconv import SampleFormat, decode_iq
from rtlsdr_airband_tpu.runtime.pipeline import Pipeline, PipelineConfig
from rtlsdr_airband_tpu.utils.siggen import am_carrier_iq, complex_noise

FS, CENTER = 2_560_000, 120_000_000


@pytest.mark.parametrize("sfmt,fullscale", [("u8", 127.5), ("s8", 128.0), ("s16", 32768.0), ("f32", 1.0)])
def test_decode_raw_iq_matches_host(sfmt, fullscale):
    """On-device decode (fused into the channelizer program) == host decoder
    (reference LUT semantics, rtl_airband.cpp:316-324,402-438)."""
    import jax.numpy as jnp

    from rtlsdr_airband_tpu.ops.channelizer import decode_raw_iq

    rng = np.random.default_rng(3)
    n = 4096
    if sfmt == "u8":
        raw = rng.integers(0, 256, 2 * n).astype(np.uint8)
        dev = decode_raw_iq(jnp.asarray(raw), sfmt, fullscale)
        host = decode_iq(raw.tobytes(), SampleFormat(sfmt), fullscale)
    elif sfmt == "s8":
        raw = rng.integers(-128, 128, 2 * n).astype(np.int8)
        dev = decode_raw_iq(jnp.asarray(raw.view(np.uint8)), sfmt, fullscale)
        host = decode_iq(raw.tobytes(), SampleFormat(sfmt), fullscale)
    elif sfmt == "s16":
        raw = rng.integers(-32768, 32768, 2 * n).astype(np.int16)
        dev = decode_raw_iq(jnp.asarray(raw), sfmt, fullscale)
        host = decode_iq(raw.tobytes(), SampleFormat(sfmt), fullscale)
    else:
        raw = rng.normal(0, 0.5, 2 * n).astype(np.float32)
        dev = decode_raw_iq(jnp.asarray(raw), sfmt, fullscale)
        host = decode_iq(raw.tobytes(), SampleFormat(sfmt), fullscale)
    np.testing.assert_array_equal(np.asarray(dev), host)


def _scene_u8(secs=1.6):
    n = int(FS * secs)
    z = am_carrier_iq(FS, 400_000, n, carrier_ampl=0.35) + complex_noise(n, 0.02, 0)
    # gate the carrier off mid-stream so squelch opens AND closes across
    # chunk boundaries
    g = np.ones(n, np.float32)
    g[int(n * 0.45) : int(n * 0.62)] = 0.0
    z = z * g + complex_noise(n, 0.01, 5)
    u8 = np.empty(2 * n, np.uint8)
    u8[0::2] = np.clip(np.round(z.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    u8[1::2] = np.clip(np.round(z.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    return u8.tobytes()


def _specs():
    return [
        ChannelSpec(frequency=120_400_000, modulation="am"),
        ChannelSpec(frequency=120_700_000, modulation="nfm", ctcss=100.0),
        ChannelSpec(frequency=120_395_000, modulation="am", bandwidth=6000.0),
    ]


def _run(raw, chunk, depth, step_bytes=512_000, slots=0, i16=False, fmt="", suppress=False, specs=None):
    cfg = PipelineConfig(
        sample_rate=FS, center_freq=CENTER, wave_rate=8000, sample_format="u8",
        fullscale=127.5, chunk_blocks=chunk, async_depth=depth,
        active_slots=slots, fetch_open_flags=True, fetch_audio_i16=i16,
        fetch_audio_fmt=fmt, suppress_fade_tails=suppress,
    )
    p = Pipeline(cfg, specs if specs is not None else _specs())

    def snap(gen):
        # slot-mode audio/iq buffers are REUSED between blocks (Pipeline.feed
        # contract) -- copy when retaining
        for o in gen:
            o = dict(o)
            o["audio"] = np.array(o["audio"])
            if "iq_out" in o:
                o["iq_out"] = np.array(o["iq_out"])
            yield o

    outs = []
    for i in range(0, len(raw), step_bytes):
        outs.extend(snap(p.feed(raw[i : i + step_bytes])))
    outs.extend(snap(p.flush()))
    return p, outs


def test_chain_matches_single_block_dispatch():
    raw = _scene_u8()
    p1, outs1 = _run(raw, chunk=1, depth=0)
    p4, outs4 = _run(raw, chunk=4, depth=1)
    assert len(outs1) == len(outs4) and len(outs1) >= 10
    for o1, o4 in zip(outs1, outs4):
        np.testing.assert_array_equal(np.asarray(o1["audio"]), o4["audio"])
        np.testing.assert_array_equal(np.asarray(o1["open_flags"]), o4["open_flags"])
        for k in ("signal_level", "noise_level", "squelch_level"):
            np.testing.assert_array_equal(np.asarray(o1[k]), o4[k])
        for k in ("open_count", "flappy_count", "ctcss_found", "ctcss_not_found"):
            np.testing.assert_array_equal(np.asarray(o1[k], np.int32), o4[k])
        np.testing.assert_array_equal(np.asarray(o1["sig_outside"]), o4["sig_outside"])
    # the scene opens and closes squelch at least once
    opens = np.asarray(p1.state.open_count)
    assert opens[0] >= 1
    # carried int state identical after both runs
    np.testing.assert_array_equal(np.asarray(p1.state.cur), np.asarray(p4.state.cur))
    np.testing.assert_array_equal(np.asarray(p1.state.sample_count), np.asarray(p4.state.sample_count))


def test_raw_ship_matches_pairs_ship():
    """Shipping raw u8 bytes (decoded on device) must equal decoding on the
    host and shipping f32 pairs."""
    raw = _scene_u8(secs=1.0)
    # raw-byte path
    _, outs_raw = _run(raw, chunk=2, depth=1)
    # pairs path: decode host-side, feed complex
    z = decode_iq(raw, SampleFormat.U8)
    zc = (z[:, 0] + 1j * z[:, 1]).astype(np.complex64)
    cfg = PipelineConfig(sample_rate=FS, center_freq=CENTER, wave_rate=8000, sample_format="f32c", chunk_blocks=2, async_depth=1, fetch_open_flags=True)
    p = Pipeline(cfg, _specs())
    outs_pairs = list(p.feed(zc)) + list(p.flush())
    assert len(outs_raw) == len(outs_pairs) >= 5
    # on TPU the two paths are bit-identical; on CPU XLA fuses the on-device
    # decode into the channelizer matmul with a different FMA/association
    # order (decode itself is bit-equal — test above), so allow float-assoc
    # noise and require near-perfect squelch gating agreement
    for a, b in zip(outs_raw, outs_pairs):
        np.testing.assert_allclose(a["audio"], b["audio"], atol=1e-5)
        agree = (a["open_flags"] == b["open_flags"]).mean()
        assert agree >= 0.999


def test_active_gather_matches_dense_on_open_channels():
    """active_slots mode with enough slots: the reconstructed audio is
    bit-identical to the dense fetch for EVERY channel — including the AM
    squelch-close fade tail and the reference-faithful 0.5 startup tail on
    closed channels (the gather keys on has-audio, not just squelch-open);
    per-block 'active' and meta arrays are unchanged."""
    raw = _scene_u8()
    _, dense = _run(raw, chunk=4, depth=1)
    p, sparse = _run(raw, chunk=4, depth=1, slots=3)
    assert len(dense) == len(sparse) >= 10
    opened_any = False
    for d, s in zip(dense, sparse):
        np.testing.assert_array_equal(d["active"], s["active"])
        opened_any |= bool(np.asarray(s["active"]).any())
        np.testing.assert_array_equal(d["audio"], s["audio"])
        for k in ("signal_level", "noise_level", "squelch_level", "open_count"):
            np.testing.assert_array_equal(np.asarray(d[k]), s[k])
        assert s["gather_overflow"] == 0
    assert opened_any
    assert p.gather_overflow_count == 0


def test_active_gather_overflow_counted():
    """More has-audio channels than slots: squelch-OPEN channels outrank
    fade-tail-only ones, ties keep the lowest channel index; dropped
    channels are silent for the block and the overflow is counted."""
    raw = _scene_u8()
    _, dense = _run(raw, chunk=2, depth=0)
    p, sparse = _run(raw, chunk=2, depth=0, slots=1)
    saw_overflow = False
    for d, s in zip(dense, sparse):
        active = np.asarray(s["active"])
        has_audio = active | np.asarray(d["audio"]).any(axis=0)
        n_has = int(has_audio.sum())
        assert s["gather_overflow"] == max(0, n_has - 1)
        if n_has > 1:
            saw_overflow = True
        open_idx = np.flatnonzero(active)
        kept = open_idx[0] if len(open_idx) else (np.flatnonzero(has_audio)[0] if n_has else None)
        if kept is not None:
            np.testing.assert_array_equal(d["audio"][:, kept], s["audio"][:, kept])
            for ci in np.flatnonzero(has_audio):
                if ci != kept:
                    assert not s["audio"][:, ci].any()
    assert saw_overflow  # the scene opens >=2 channels at once
    assert p.gather_overflow_count > 0


def test_flush_warm_precompiles_k1_chain():
    """After the first chunked dispatch, the k=1 flush program is compiled in
    the background (flush()/retune must not stall on a fresh compile); the
    warm call must not perturb streaming results."""
    import time

    from rtlsdr_airband_tpu.runtime import pipeline as plmod

    raw = _scene_u8(secs=1.2)
    p, outs = _run(raw, chunk=4, depth=0)
    assert p._flush_warmed
    # wait for the daemon warm thread to finish compiling
    import threading

    for t in threading.enumerate():
        if t.name == "flush-warm":
            t.join(timeout=120)
    before = plmod.pipeline_chain._cache_size()
    # a k=1 dispatch now must be a cache hit: no new executable entry
    leftover = p._pending_samples()
    outs2 = list(p.flush())
    if leftover >= p._block_len:
        assert plmod.pipeline_chain._cache_size() == before
    # the streamed results are the same as an un-warmed single-block run
    p1, outs1 = _run(raw, chunk=1, depth=0)
    for a, b in zip(outs1, outs + outs2):
        np.testing.assert_array_equal(np.asarray(a["audio"]), b["audio"])


def test_i16_audio_fetch_within_quantization_bound():
    """fetch_audio_i16 ships audio as int16 (half the D2H bytes): every
    sample within one 1/32767 quantization step of the f32 fetch; gating,
    active flags and meta are bit-identical."""
    raw = _scene_u8()
    _, dense = _run(raw, chunk=4, depth=1)
    _, q = _run(raw, chunk=4, depth=1, i16=True)
    assert len(dense) == len(q) >= 10
    for d, s in zip(dense, q):
        np.testing.assert_array_equal(d["active"], s["active"])
        np.testing.assert_array_equal(d["open_flags"], s["open_flags"])
        assert np.abs(np.asarray(d["audio"]) - np.asarray(s["audio"])).max() <= 1.0 / 32767.0 + 1e-7
        for k in ("signal_level", "noise_level", "open_count"):
            np.testing.assert_array_equal(np.asarray(d[k]), s[k])


def test_i16_audio_fetch_composes_with_active_slots():
    raw = _scene_u8()
    _, dense = _run(raw, chunk=2, depth=0)
    _, q = _run(raw, chunk=2, depth=0, slots=3, i16=True)
    for d, s in zip(dense, q):
        np.testing.assert_array_equal(d["active"], s["active"])
        assert np.abs(np.asarray(d["audio"]) - np.asarray(s["audio"])).max() <= 1.0 / 32767.0 + 1e-7


def test_i8bf_audio_fetch_within_quantization_bound():
    """fetch_audio_fmt='i8bf' ships block-float int8 (quarter the D2H bytes):
    every sample within half an LSB of its channel's per-block scale; exact
    zeros stay exact; gating/meta bit-identical."""
    raw = _scene_u8()
    _, dense = _run(raw, chunk=4, depth=1)
    _, q = _run(raw, chunk=4, depth=1, fmt="i8bf")
    assert len(dense) == len(q) >= 10
    for d, s in zip(dense, q):
        np.testing.assert_array_equal(d["active"], s["active"])
        np.testing.assert_array_equal(d["open_flags"], s["open_flags"])
        da, sa = np.asarray(d["audio"]), np.asarray(s["audio"])
        step = np.abs(da).max(axis=0) / 127.0  # per-channel LSB
        assert (np.abs(da - sa) <= step[None, :] * 0.5 + 1e-7).all()
        # true silence stays exactly silent (sub-LSB values MAY round to 0)
        assert not sa[da == 0.0].any()
        for k in ("signal_level", "noise_level", "open_count"):
            np.testing.assert_array_equal(np.asarray(d[k]), s[k])


def test_i8bf_composes_with_active_slots():
    raw = _scene_u8()
    _, dense = _run(raw, chunk=2, depth=0)
    _, q = _run(raw, chunk=2, depth=0, slots=3, fmt="i8bf")
    for d, s in zip(dense, q):
        np.testing.assert_array_equal(d["active"], s["active"])
        da, sa = np.asarray(d["audio"]), np.asarray(s["audio"])
        step = np.abs(da).max(axis=0) / 127.0
        assert (np.abs(da - sa) <= step[None, :] * 0.5 + 1e-7).all()


def _nfm_scene_u8(secs=2.0):
    """AM carrier (+400 kHz) plus an NFM carrier (+300 kHz) that is gated off
    at several points chosen so squelch closes land both mid-block and within
    AGC_EXTRA samples of a block boundary (the real-audio spill case that
    fade-tail suppression must NOT suppress)."""
    from rtlsdr_airband_tpu.utils.siggen import nfm_carrier_iq

    n = int(FS * secs)
    tone = np.sin(2 * np.pi * 900.0 * np.arange(int(8000 * secs)) / 8000).astype(np.float64)
    znfm = nfm_carrier_iq(FS, 300_000, n, audio=tone, audio_rate=8000)
    # output block = 1000 samples @ 8 kHz = 320k input samples; gate the NFM
    # carrier off at output offsets ~{690, 760, 790, 820} mod 1000 so the
    # ~197-sample close delay scatters closes across the block boundary
    g = np.ones(n, np.float32)
    hop = FS // 8000
    for off_blocks, off_out in ((3, 690), (6, 760), (9, 790), (12, 820)):
        a = (off_blocks * 1000 + off_out) * hop
        g[a : a + 150 * hop] = 0.0  # 150 output samples of dead air
    zam = am_carrier_iq(FS, 400_000, n, carrier_ampl=0.35)
    gam = np.ones(n, np.float32)
    gam[int(n * 0.45) : int(n * 0.6)] = 0.0
    z = znfm * g + zam * gam + complex_noise(n, 0.015, 2)
    u8 = np.empty(2 * n, np.uint8)
    u8[0::2] = np.clip(np.round(z.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    u8[1::2] = np.clip(np.round(z.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    return u8.tobytes()


def _nfm_specs():
    return [
        ChannelSpec(frequency=120_400_000, modulation="am"),
        ChannelSpec(frequency=120_300_000, modulation="nfm"),
    ]


def test_fade_tail_suppression_matches_dense():
    """suppress_fade_tails: closed-channel tails are synthesized on host
    instead of shipped.  NFM audio must be BIT-exact (real-audio spill
    blocks ship via the must-ship rule; the startup 0.5 prefix and silence
    synthesize exactly); AM audio matches within f32 rounding of the
    0.94^i fade restart; active/meta unchanged; and the block-0 startup
    flood no longer competes for slots (zero overflows at slots=2)."""
    raw = _nfm_scene_u8()
    _, dense = _run(raw, chunk=4, depth=1, specs=_nfm_specs())
    p, s = _run(raw, chunk=4, depth=1, slots=2, suppress=True, specs=_nfm_specs())
    assert len(dense) == len(s) >= 14
    nfm_closes = 0
    for i, (d, sb) in enumerate(zip(dense, s)):
        np.testing.assert_array_equal(d["active"], sb["active"])
        da, sa = np.asarray(d["audio"]), np.asarray(sb["audio"])
        # NFM channel: bit-exact everywhere
        np.testing.assert_array_equal(da[:, 1], sa[:, 1], err_msg=f"block {i} NFM")
        # AM channel: exact except fade-restart f32 rounding
        np.testing.assert_allclose(da[:, 0], sa[:, 0], atol=2e-5, err_msg=f"block {i} AM")
        assert sb["gather_overflow"] == 0
        for k in ("signal_level", "noise_level", "open_count"):
            np.testing.assert_array_equal(np.asarray(d[k]), sb[k])
        nfm_closes = max(nfm_closes, int(np.asarray(d["open_count"])[1]))
    assert p.gather_overflow_count == 0
    # the scene must actually exercise open/close on the NFM channel
    assert nfm_closes >= 3
    # block 0: whole-population startup tails present in dense, synthesized
    # (0.5 prefix, bit-exact already asserted above) rather than shipped
    assert np.asarray(dense[0]["audio"])[:100].any()


def test_suppression_overflow_counts_only_must_ship():
    """With suppression on, fade-tail-only channels are not 'active' for
    overflow accounting: a 1-slot run over the 3-channel scene counts only
    genuinely open (or NFM-spill) channels beyond the slot cap."""
    raw = _scene_u8()
    _, dense = _run(raw, chunk=2, depth=0)
    p, s = _run(raw, chunk=2, depth=0, slots=1, suppress=True)
    for d, sb in zip(dense, s):
        active = np.asarray(sb["active"])
        assert sb["gather_overflow"] == max(0, int(active.sum()) - 1)


def test_meta_per_chunk_matches_chunk_end_meta():
    """fetch_meta_per_chunk ships one stats snapshot per dispatch chunk: the
    audio/active stream is untouched, and every block of a chunk reports the
    chunk-END meta (what the 15 s stats cadence would read anyway)."""
    raw = _scene_u8()
    _, dense = _run(raw, chunk=4, depth=1)
    cfg = PipelineConfig(
        sample_rate=FS, center_freq=CENTER, wave_rate=8000, sample_format="u8",
        fullscale=127.5, chunk_blocks=4, async_depth=1, fetch_meta_per_chunk=True,
    )
    p = Pipeline(cfg, _specs())
    outs = []
    for i in range(0, len(raw), 512_000):
        outs.extend(p.feed(raw[i : i + 512_000]))
    outs.extend(p.flush())
    assert len(outs) == len(dense) >= 10
    for i, (d, s) in enumerate(zip(dense, outs)):
        np.testing.assert_array_equal(np.asarray(d["audio"]), np.asarray(s["audio"]), err_msg=f"block {i}")
        np.testing.assert_array_equal(d["active"], s["active"])
        # chunk-end semantics: block i reports the meta of its chunk's last block
        j = min((i // 4) * 4 + 3, len(dense) - 1)
        for k in ("signal_level", "noise_level", "squelch_level", "open_count", "flappy_count"):
            np.testing.assert_array_equal(np.asarray(dense[j][k]), np.asarray(s[k]), err_msg=f"block {i} {k}")


def test_warm_precompile_does_not_change_results():
    """Pipeline.warm() compiles the chain on zeroed inputs before streaming
    (slow-compile backends); it must be observationally pure."""
    raw = _scene_u8(secs=1.0)
    _, base = _run(raw, chunk=2, depth=1)

    cfg = PipelineConfig(
        sample_rate=FS, center_freq=CENTER, wave_rate=8000, sample_format="u8",
        fullscale=127.5, chunk_blocks=2, async_depth=1, fetch_open_flags=True,
    )
    p = Pipeline(cfg, _specs())
    p.warm()
    outs = []
    for i in range(0, len(raw), 512_000):
        outs.extend(p.feed(raw[i : i + 512_000]))
    outs.extend(p.flush())  # no slots -> arrays are not reused, safe to retain
    assert len(outs) == len(base)
    for a, b in zip(base, outs):
        np.testing.assert_array_equal(np.asarray(a["audio"]), np.asarray(b["audio"]))
        np.testing.assert_array_equal(np.asarray(a["active"]), np.asarray(b["active"]))
