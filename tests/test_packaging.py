"""Deployment packaging parity (reference ships init.d/ scripts, a systemd
unit and a Dockerfile — /root/reference/init.d/rtl_airband.service,
/root/reference/Dockerfile): the equivalents must exist and reference the
console-script entry point that pyproject installs."""

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(*parts):
    with open(os.path.join(ROOT, *parts)) as f:
        return f.read()


def test_console_script_declared():
    py = _read("pyproject.toml")
    assert re.search(r'rtl-airband-tpu\s*=\s*"rtlsdr_airband_tpu\.cli:main"', py)


def test_systemd_unit():
    unit = _read("deploy", "rtl-airband-tpu.service")
    assert "[Unit]" in unit and "[Service]" in unit and "[Install]" in unit
    assert re.search(r"ExecStart=.*rtl-airband-tpu .*-c ", unit)
    assert "WantedBy=multi-user.target" in unit


def test_initd_script():
    sh = _read("deploy", "rtl-airband-tpu.init.sh")
    assert sh.startswith("#!/bin/sh")
    for verb in ("start", "stop", "restart", "status"):
        assert f"{verb})" in sh, verb
    assert "rtl-airband-tpu" in sh


def test_dockerfile():
    df = _read("Dockerfile")
    assert 'ENTRYPOINT ["rtl-airband-tpu"]' in df
    assert "pip install" in df and "jax" in df
    # the runtime stage must carry the host-sink shared libraries the ctypes
    # bindings look for (LAME at minimum)
    assert "libmp3lame" in df


def test_cli_version_runs():
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "rtlsdr_airband_tpu", "-v"],
        capture_output=True, text=True, timeout=120, cwd=ROOT,
    )
    assert r.returncode == 0
    assert "rtlsdr-airband-tpu" in r.stdout + r.stderr
