"""Persistent XLA compilation cache.

Under the remote-compile TPU path a cold compile of the NMPC solver costs
minutes; the persistent cache makes every process after the first start
instantly. Called by all CLI entrypoints and bench.py.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get("IRBFN_COMPILE_CACHE",
                                  "/tmp/irbfn_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: stay uncached
    return path
