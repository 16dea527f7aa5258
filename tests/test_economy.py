"""Adaptive fetch economy: policy unit tests (simulated transport drift)
plus a live mid-stream rung switch on the Pipeline.

The controller is the TPU-native analog of the reference's visible load
management (overrun counters + logs, reference: src/rtl_airband.cpp:649-655)
for a transport whose bandwidth drifts under the program (CLAUDE.md: the
axon tunnel spans 97->170 ms/block for the same program between sessions)."""

import numpy as np

from rtlsdr_airband_tpu.runtime.economy import FetchEconomy, Rung, default_ladder


def test_default_ladder_shape():
    l = default_ladder(192, "i16")
    assert l[0].slots == 384  # roomy rung above the operating point
    assert Rung(192, "i16") in l
    assert l[-1] == Rung(96, "i8bf")  # emergency rung
    assert len(l) == len({(r.slots, r.fmt) for r in l})
    # costs are monotonically non-increasing after the roomy rung
    costs = [r.cost() for r in l[1:]]
    assert costs == sorted(costs, reverse=True)


def test_slow_window_steps_down_then_recovers():
    """Drift trace: healthy -> 3x-slow window -> healthy.  The controller
    sheds fetch bytes during the window (NOTICE-able shifts) and climbs
    back once the transport recovers and stays clean."""
    l = default_ladder(192, "i16")
    econ = FetchEconomy(l, start=1)
    base = l.index(Rung(192, "i16"))
    assert econ.idx == 1 == base
    path = []
    for _ in range(20):  # healthy: 60 ms/block, no overflow
        s = econ.observe(60.0, 0)
        if s is not None:
            path.append(s)
    assert path == []  # stable under healthy conditions
    for _ in range(30):  # 5x-slow window: 300 ms/block
        s = econ.observe(300.0, 0)
        if s is not None:
            path.append(s)
    assert path and all(b > a for a, b in zip([base] + path, path))  # only down
    assert econ.idx > base
    down_idx = econ.idx
    for _ in range(200):  # recovery: 40 ms/block, clean
        s = econ.observe(40.0, 0)
        if s is not None:
            path.append(s)
    assert econ.idx == base < down_idx  # climbed back to the configured rung
    # no thrash: each shift respected the cooldown
    assert econ.shift_count <= 8


def test_sustained_overflow_jumps_to_more_slots():
    l = default_ladder(192, "i16")
    econ = FetchEconomy(l, start=1)
    for _ in range(10):
        econ.observe(60.0, 0)
    # two consecutive overflowing observations -> jump to a roomier rung
    assert econ.observe(60.0, 5) is None
    new = econ.observe(60.0, 7)
    assert new is not None and econ.rung.slots > 192
    # the chosen roomier rung is the cheapest one with more slots
    assert econ.rung == min((r for r in l if r.slots > 192), key=lambda r: r.cost())
    # once clean for long enough, settles back down to the configured rung
    for _ in range(200):
        econ.observe(60.0, 0)
    assert econ.idx == econ.home == 1


def test_overflow_at_max_slots_is_a_no_op():
    econ = FetchEconomy([Rung(64, "i16"), Rung(64, "i8bf")], start=0)
    for _ in range(10):
        econ.observe(60.0, 0)
    for _ in range(6):
        assert econ.observe(60.0, 3) is None  # nowhere roomier to go


def test_no_thrash_when_both_overflowing_and_slow():
    """The hard case (seen live on the CPU smoke of bench_app): the device is
    both over budget AND overflowing its slots.  The overflow jump pins a
    slots floor, so the slow rule may not shed back below it — the
    controller settles on the roomier rung instead of oscillating."""
    l = default_ladder(2, "i16")  # [4/i8bf, 2/i16, 2/i8bf, 1/i8bf]
    econ = FetchEconomy(l, start=1)
    shifts = []
    for i in range(60):
        # overflowing at 2 slots, never overflowing at 4; always slow
        over = 1 if econ.rung.slots < 4 else 0
        s = econ.observe(300.0, over)
        if s is not None:
            shifts.append(s)
    assert econ.rung == Rung(4, "i8bf")
    # one overflow jump; no subsequent shed below the floor
    assert len(shifts) == 1, shifts


def test_single_blip_does_not_shift():
    econ = FetchEconomy(default_ladder(192, "i16"), start=1)
    for _ in range(10):
        econ.observe(60.0, 0)
    assert econ.observe(400.0, 1) is None  # one bad chunk: EMA absorbs it
    assert econ.observe(60.0, 0) is None
    assert econ.idx == 1


def test_live_rung_switch_mid_stream():
    """apply_rung mid-stream: the next dispatch uses the new program and the
    reconstructed audio stays equivalent to the dense fetch (i8bf rung: to
    within its block-float LSB)."""
    from tests.test_pipeline_chain import _run, _scene_u8, _specs
    from rtlsdr_airband_tpu.runtime.pipeline import Pipeline, PipelineConfig

    raw = _scene_u8()
    _, dense = _run(raw, chunk=2, depth=0)

    FS, CENTER = 2_560_000, 120_000_000
    cfg = PipelineConfig(
        sample_rate=FS, center_freq=CENTER, wave_rate=8000, sample_format="u8",
        fullscale=127.5, chunk_blocks=2, async_depth=0,
        active_slots=3, fetch_audio_fmt="i16",
    )
    p = Pipeline(cfg, _specs())
    outs = []
    half = len(raw) // 2
    for out in p.feed(raw[:half]):
        outs.append(np.array(out["audio"]))
    p.apply_rung(6, "i8bf")  # economy shift between chunks
    for out in p.feed(raw[half:]):
        outs.append(np.array(out["audio"]))
    for out in p.flush():
        outs.append(np.array(out["audio"]))
    assert len(outs) == len(dense)
    for d, a in zip(dense, outs):
        da = np.asarray(d["audio"])
        step = np.abs(da).max(axis=0) / 127.0  # worst-case rung LSB
        assert (np.abs(da - a) <= step[None, :] * 0.5 + 1.0 / 32767.0 + 1e-7).all()


def test_app_attaches_economy_and_shifts(tmp_path):
    """fetch_economy = 'auto' attaches a controller to gather-mode devices;
    a forced slow-window observation stream shifts the pipeline's live
    fetch knobs and logs the shift."""
    from tests.test_app import loads_config, write_iq
    from rtlsdr_airband_tpu.app import App

    iq = tmp_path / "iq.bin"
    write_iq(str(iq), secs=0.3)
    cfg = loads_config(
        f'active_fetch_slots = 4; fetch_audio_fmt = "i16"; fetch_economy = "auto";\n'
        f'devices: ( {{ type = "file"; filepath = "{iq}"; sample_format = "u8"; '
        'sample_rate = 2560000; centerfreq = 120.0; speedup_factor = 0.0; '
        'channels: ( { freq = 120.4; outputs: ( { type = "udp_stream"; '
        'dest_address = "127.0.0.1"; dest_port = 4102; } ); } ); } );'
    )
    app = App(cfg)
    rt = app.devices[0]
    assert rt.economy is not None
    assert rt.pipeline.cfg.active_slots == 4 and rt.pipeline.cfg.audio_fmt == "i16"
    for _ in range(30):  # sustained 3x-over-budget handling time
        app._observe_economy(rt, 400.0)
    assert rt.pipeline.cfg.audio_fmt == "i8bf"  # shifted to a cheaper rung
    assert rt.economy.shift_count >= 1
    rt.pipeline.close()  # join the neighbor warm threads
