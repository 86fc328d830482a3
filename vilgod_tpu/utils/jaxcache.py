"""Persistent XLA compilation cache.

The hosted TPU environment has a single host CPU core, so compiling the
whole-sequence pipeline programs is the dominant one-time cost. Enabling
JAX's persistent cache makes every later process (benchmarks, the CLI,
tests on the same shapes) start from compiled binaries.
"""
from __future__ import annotations

import os
from pathlib import Path

DEFAULT_DIR = os.environ.get("VILGOD_JAX_CACHE", "/tmp/vilgod_jax_cache")


def enable_compilation_cache(cache_dir: str | None = None):
    import jax

    path = Path(cache_dir or DEFAULT_DIR)
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
