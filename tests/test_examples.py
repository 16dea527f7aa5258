"""Every shipped example config must parse (the reference ships its example
configs in-tree too; config surface documented in docs/CONFIG.md)."""

import glob
import os

import pytest

from rtlsdr_airband_tpu.runtime.config import load_config

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.conf")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_config_parses(path):
    cfg = load_config(path)
    assert cfg.devices
    for d in cfg.devices:
        assert d.channels


def test_multichip_example_declares_mesh():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "examples", "multichip.conf"))
    assert cfg.mesh_devices == 8
    assert cfg.active_fetch_slots > 0
    assert cfg.fetch_audio_i16
