"""Multi-host sharding test: two real processes, jax.distributed, CPU mesh.

Simulates a 2-host pod slice (2 processes x 2 virtual CPU devices = a 2x2
('time','chan') mesh): each process ingests only its time slice of the IQ
scene, the sharded step runs on global arrays, and each process verifies the
audio channels it holds against a single-process reference (SURVEY.md §4:
multi-host tests on CPU meshes need no real pod).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_pipeline():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, WORKER, coord, str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "ok=True" in out
