"""Profiling / observability helpers.

Covers the reference's aux-subsystem surface (SURVEY.md §5):

- wall-clock throughput profiling ("TrajGen frequency Hz",
  deprecated/evaluate.py:208-240 analogue) with proper device sync;
- jax profiler trace context (the commented-out hooks at
  deprecated/evaluate.py:52-54, made real);
- retrace guard: assert a jitted function is not silently recompiled in a
  hot loop (the chex.assert_max_traces discipline, dynamics.py:10 etc.);
- NaN guard context (jax_debug_nans, train_nmpc_frenet.py:13);
- lightweight metric logging to JSONL (wandb-less observability; a wandb
  adapter hooks in when available).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Callable, Optional

import jax
import numpy as np


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            sync: str = "block") -> dict:
    """Median wall time of fn(*args) with device sync.

    sync="block": block_until_ready on outputs; "fetch": sum-reduce and
    fetch a scalar (defeats async-dispatch artifacts on remote backends).
    """
    def run():
        out = fn(*args)
        if sync == "fetch":
            leaves = jax.tree.leaves(out)
            total = sum(jax.numpy.sum(l) for l in leaves
                        if hasattr(l, "dtype") and jax.numpy.issubdtype(
                            l.dtype, jax.numpy.number))
            float(total)
        else:
            jax.block_until_ready(out)

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {"median_s": float(np.median(arr)), "mean_s": float(arr.mean()),
            "p10_s": float(np.percentile(arr, 10)),
            "p90_s": float(np.percentile(arr, 90)), "iters": iters}


def throughput(fn: Callable, *args, items: int, **kw) -> dict:
    """items/sec ("TrajGen frequency") with sync-corrected timing."""
    stats = time_fn(fn, *args, **kw)
    stats["items_per_s"] = items / stats["median_s"]
    return stats


def chain_latency(fwd: Callable, x, c1: int = 64, c2: int = 1024,
                  warmup: int = 2, iters: int = 10) -> float:
    """Per-call ON-DEVICE latency of ``fwd(x)`` via the two-chain-length
    slope.

    ``chain`` sequentially-dependent forwards run inside ONE jitted call
    (the data dependency — input perturbed by the running checksum — stops
    XLA from parallelizing the chain); the remote tunnel's ~25 ms RTT and
    any fixed dispatch cost cancel in (T(c2) - T(c1)) / (c2 - c1). A single
    wall-clock/batch measurement does NOT cancel them and over-reports
    sub-ms latencies ~20x through the tunnel (bench.py round-1 lesson).
    """
    import jax.numpy as jnp

    def chained(chain):
        def run(xx):
            def body(_, acc):
                y = fwd(xx + 1e-20 * acc)
                return acc + jnp.sum(y)

            return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

        return jax.jit(run)

    def med(f):
        for _ in range(warmup):
            float(f(x))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = med(chained(c1)), med(chained(c2))
    return (t2 - t1) / (c2 - c1)


@contextlib.contextmanager
def trace(logdir: str = "./jax_trace"):
    """jax profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class RetraceGuard:
    """Fail loudly if a jitted function retraces more than ``max_traces``
    times — the chex.assert_max_traces discipline for our hot paths."""

    def __init__(self, fn: Callable, max_traces: int = 1, name: str = ""):
        self._fn = jax.jit(fn) if not hasattr(fn, "lower") else fn
        self.max_traces = max_traces
        self.name = name or getattr(fn, "__name__", "fn")

    def __call__(self, *args, **kw):
        out = self._fn(*args, **kw)
        n = self._fn._cache_size() if hasattr(self._fn, "_cache_size") else None
        if n is not None and n > self.max_traces:
            raise RuntimeError(
                f"{self.name} retraced {n}x (max {self.max_traces}); "
                "check for varying shapes/dtypes in the hot loop")
        return out


class MetricLogger:
    """JSONL metric logging with optional wandb mirroring.

    The reference logs per-batch losses to wandb (train_nmpc_frenet.py:
    522-537); here the primary sink is a local JSONL (works offline) and
    wandb attaches only if importable AND configured.
    """

    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 project: str = "irbfn_tpu", config: Optional[dict] = None,
                 tags=None):
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")
        else:
            self._fh = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: PLC0415

                self._wandb = wandb
                wandb.init(project=project, config=config, tags=tags)
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: Optional[int] = None):
        rec = {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float))
                   else v) for k, v in metrics.items() if v is not None}
        if step is not None:
            rec["step"] = step
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb:
            self._wandb.log(rec, step=step)

    def close(self):
        if self._fh:
            self._fh.close()
