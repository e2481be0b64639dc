"""Shared utilities: CLI flag groups, profiling/observability."""

from irbfn_tpu.utils.profiling import (
    MetricLogger,
    RetraceGuard,
    debug_nans,
    throughput,
    time_fn,
    trace,
)

__all__ = ["MetricLogger", "RetraceGuard", "debug_nans", "throughput",
           "time_fn", "trace"]
