"""Persistent XLA compilation cache (VERDICT r2 item 5).

Every serving entry point pays 30-60 s of jit compilation per (shape
family) on the first run; with the persistent cache a warm process reuses
the compiled executables from disk (including across the multi-hour chip
recovery loops on this environment's tunneled v5e).

Call ``enable()`` BEFORE the first jit compilation.  Safe to call more than
once; a custom directory can be passed or set via CHATTS_COMPILE_CACHE.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/chatts_tpu_xla")

_enabled = False


def enable(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache; returns the directory."""
    global _enabled
    import jax

    cache_dir = (cache_dir or os.environ.get("CHATTS_COMPILE_CACHE")
                 or DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Serving executables are the point: cache everything that took real
    # compile time (default thresholds skip sub-second / small entries).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir
