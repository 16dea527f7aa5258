"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The surrounding environment pins JAX_PLATFORMS=axon (the TPU tunnel), and jax
ignores a plain env-var override here, so the platform is forced via
jax.config.  Sharding semantics are validated on the 8-device CPU mesh;
bench.py runs on the real TPU chip separately.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# cache the CPU compiles too (the XLA demod scan dominates suite wall time;
# repeat runs of the same shapes start instantly)
from rtlsdr_airband_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
