"""Shared utilities: CLI flag groups, profiling/observability."""

from irbfn_tpu.utils.cache import enable_compilation_cache
from irbfn_tpu.utils.profiling import (
    MetricLogger,
    RetraceGuard,
    debug_nans,
    throughput,
    time_fn,
    trace,
)

__all__ = ["enable_compilation_cache", "MetricLogger", "RetraceGuard", "debug_nans", "throughput",
           "time_fn", "trace"]
