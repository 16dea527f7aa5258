"""Every shipped example config must parse into a valid GlobalConfig
(the reference ships analogous examples under config/)."""

import glob
import os

import pytest

from rtlsdr_airband_tpu.runtime.config import load_config

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.conf")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_parses(path):
    cfg = load_config(path)
    assert cfg.devices
    for d in cfg.devices:
        assert d.channels
        for ch in d.channels:
            assert ch.freqs
            assert ch.outputs


def test_examples_exist():
    assert len(EXAMPLES) >= 4
