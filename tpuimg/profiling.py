"""Profiling/tracing helpers.

The reference's observability is cudaEvent timers plus "GPU time by
nsight/nvprof" (Histogram/main.cpp:151; SURVEY.md §5). TPU equivalents:

- ``trace(logdir)``: context manager around ``jax.profiler`` — view with
  TensorBoard/XProf.
- ``stage_times``: per-stage latency breakdown by jitting stages separately
  (the reference gets per-kernel times by running ladder variants separately,
  SURVEY.md §3.1).
"""

from __future__ import annotations

import contextlib

import jax

from tpuimg.core.timing import time_stream_fn


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpuimg_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def stage_times(stages, x, iters: int = 20):
    """Time a list of (name, fn) stages individually and chained.

    Each fn maps an array to an array of the same shape/dtype family; the
    chained entry shows what XLA fusion across stages buys.
    """
    results = {}
    v = x
    for name, fn in stages:
        results[name] = time_stream_fn(fn, v, iters=iters, name=name).ms
        v = jax.block_until_ready(fn(v))  # next stage times on real stage input

    def chained(u):
        for _, fn in stages:
            u = fn(u)
        return u

    results["chained"] = time_stream_fn(chained, x, iters=iters, name="chained").ms
    return results
