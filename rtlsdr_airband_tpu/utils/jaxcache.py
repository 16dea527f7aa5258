"""Persistent XLA compilation cache.

The fused pipeline block compiles in minutes on TPU (long lax.scan body);
the persistent cache makes every later process start instantly for the same
shapes.  Called by the CLI, bench, and driver entry points — not on library
import (libraries should not mutate global jax config).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/rtlsdr_airband_tpu/xla")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    d = path or os.environ.get("RTLSDR_AIRBAND_TPU_CACHE", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
