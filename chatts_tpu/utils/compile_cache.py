"""Persistent XLA compilation cache (VERDICT r2 item 5).

Every serving entry point pays 30-60 s of jit compilation per (shape
family) on the first run; with the persistent cache a warm process reuses
the compiled executables from disk (including across the multi-hour chip
recovery loops on this environment's tunneled v5e).

Call ``enable()`` BEFORE the first jit compilation.  Safe to call more than
once; a custom directory can be passed or set via CHATTS_COMPILE_CACHE.
"""
from __future__ import annotations

import hashlib
import os

DEFAULT_DIR = os.path.expanduser("~/.cache/chatts_tpu_xla")

_enabled = False


def _platform_tag() -> str:
    """Cache-subdirectory tag for the platform the entries compile FOR.

    XLA's persistent-cache key does NOT include the host CPU feature set,
    so a CPU AOT result cached on one machine can SIGILL on another (seen
    as cpu_aot_loader 'machine type ... doesn't match' errors when this
    cache directory survives a host change).  TPU executables don't care
    about host features; CPU entries get a per-host feature fingerprint.
    Reads config/env only — must NOT initialize the backend (callers
    enable() before their first jit, sometimes before choosing a
    platform; set jax_platforms BEFORE calling enable())."""
    import jax

    plats = (getattr(jax.config, "jax_platforms", None)
             or os.environ.get("JAX_PLATFORMS") or "default")
    first = plats.split(",")[0].strip().lower() or "default"
    if first == "cpu":
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
        except OSError:
            import platform as _platform

            flags = _platform.processor()
        return "cpu-" + hashlib.sha1(flags.encode()).hexdigest()[:10]
    return first


def enable(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache; returns the directory."""
    global _enabled
    import jax

    cache_dir = (cache_dir or os.environ.get("CHATTS_COMPILE_CACHE")
                 or DEFAULT_DIR)
    cache_dir = os.path.join(cache_dir, _platform_tag())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Serving executables are the point: cache everything that took real
    # compile time (default thresholds skip sub-second / small entries).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir
