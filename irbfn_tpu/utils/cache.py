"""Persistent XLA compilation cache.

Under the remote-compile TPU path a cold compile of the NMPC solver costs
minutes; the persistent cache makes every process after the first start
instantly. Called by all CLI entrypoints and bench.py.

The cache is enabled ONLY for TPU-family backends by default: XLA:CPU
persists AOT-compiled executables whose deserialization has been observed
to segfault intermittently on this image (cpu_aot_loader machine-feature
mismatches; two full-suite crashes in `jax/_src/compilation_cache.py:
get_executable_and_time`), and CPU runs are test runs where a cold compile
is merely slow. Set IRBFN_CPU_CACHE=1 to opt CPU runs in anyway.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    # honor an explicit JAX_PLATFORMS=cpu from the environment. The axon
    # site hook re-registers its platform at import and wins the default
    # resolution regardless of the env var (jax snapshots it before the
    # hook runs), so a "CPU-forced" script still initializes the remote
    # TPU backend — and hangs or dies with UNAVAILABLE whenever the
    # tunnel is down (observed: $CPU-prefixed verify/demo runs crashing
    # in apply_primitive -> axon init). jax.config.update after import is
    # the only reliable override (same dance as tests/conftest.py).
    env_plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if env_plat and "axon" not in env_plat:
        try:
            jax.config.update("jax_platforms", env_plat)
        except Exception:
            pass

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "cpu" and not os.environ.get("IRBFN_CPU_CACHE"):
        return None
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
