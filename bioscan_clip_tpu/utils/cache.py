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
    """Turn on the on-disk compilation cache. Returns True if enabled.

    TPU-only by default: XLA:CPU cache entries embed host machine features,
    and replaying them on a different host warns "could lead to SIGILL"
    (observed across this repo's CI hosts). CPU compiles are seconds anyway;
    the cache's value is the tunneled-TPU compiles. Set
    ``BSCAN_COMPILATION_CACHE=<dir>`` to force it on for any backend.
    """
    forced = bool(os.environ.get("BSCAN_COMPILATION_CACHE"))
    if os.environ.get("BSCAN_COMPILATION_CACHE") == "0":
        return False
    try:
        import jax

        # Decide from the configured platform list (no backend init — that
        # would dial the tunnel during import in ambient interpreters).
        platforms = (
            getattr(jax.config, "jax_platforms", None)
            or os.environ.get("JAX_PLATFORMS", "")
            or ""
        )
        if not forced and platforms.split(",")[0].strip() == "cpu":
            return False
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        # cache everything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
