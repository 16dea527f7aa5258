"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Sharding semantics are validated on CPU (no TPU pod needed); bench.py runs on
real TPU hardware separately.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
