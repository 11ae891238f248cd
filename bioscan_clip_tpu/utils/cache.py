"""Persistent XLA compilation cache.

Compiles of the flagship train/extract programs take 20 s - 30 min through
the axon tunnel (PERF_NOTES.md). Enabling JAX's persistent compilation
cache makes every repeat invocation (same program, same devices) start in
seconds. Safe to call unconditionally: failures (read-only FS, backend
without cache support) degrade to the in-memory cache.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "BSCAN_COMPILATION_CACHE", os.path.expanduser("~/.cache/bioscan_clip_tpu_xla")
)


def enable_compilation_cache(directory: str = DEFAULT_DIR) -> bool:
    """Turn on the on-disk compilation cache. Returns True if enabled."""
    if os.environ.get("BSCAN_COMPILATION_CACHE") == "0":
        return False
    try:
        import jax

        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        # cache everything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
