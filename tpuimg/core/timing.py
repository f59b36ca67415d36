"""Benchmark timing utilities.

TPU equivalent of the reference's ``GpuTimer`` (cudaEvent elapsed time,
`Integral/cuda_utils.h:134-161`) and warm-up discipline
(`GaussianFilter/gaussian.cu:484-491`): jit + warm-up calls, then wall-clock
around ``block_until_ready``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class BenchResult:
    name: str
    ms: float  # p50 per-iteration milliseconds
    ms_min: float
    ms_mean: float
    pixels: int | None = None

    @property
    def gpix_s(self) -> float | None:
        if self.pixels is None:
            return None
        return self.pixels / (self.ms * 1e-3) / 1e9


def time_fn(fn, *args, warmup: int = 3, iters: int = 20, name: str = "op",
            pixels: int | None = None) -> BenchResult:
    """Time ``fn(*args)`` with warm-up; returns per-iteration stats in ms."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        samples.append((time.perf_counter() - t0) * 1e3)
    samples.sort()
    p50 = samples[len(samples) // 2]
    return BenchResult(name=name, ms=p50, ms_min=samples[0],
                       ms_mean=sum(samples) / len(samples), pixels=pixels)


def _default_feedback(y, x):
    """Map an op output back to a valid op input to serialize scan iterations."""
    if isinstance(y, (tuple, list)):
        y = y[0]
    if y.shape == x.shape and y.dtype == x.dtype:
        return y
    if y.shape == x.shape:
        if jnp.issubdtype(x.dtype, jnp.integer):
            info = jnp.iinfo(x.dtype)
            span = int(info.max) - int(info.min) + 1
            return (y.astype(jnp.int32) % span + int(info.min)).astype(x.dtype)
        return y.astype(x.dtype)
    raise ValueError("provide an explicit feedback fn for shape-changing ops")


def time_scan_fn(fn, x, *, iters: int = 50, warmup_reps: int = 2, name: str = "op",
                 pixels: int | None = None, feedback=_default_feedback) -> BenchResult:
    """Device-side loop timing — robust on runtimes where ``block_until_ready``
    does not actually block (e.g. tunneled platforms).

    Runs ``iters`` data-dependent iterations of ``fn`` inside one jitted
    ``lax.scan`` (the reference's ``nrepeats`` amortization,
    GaussianFilter/gaussian.cu:498-516) and forces completion with a scalar
    device→host fetch. Reported ms = (t(iters) − t(1)) / (iters − 1), so
    dispatch and transfer latency cancel.
    """

    def make(n):
        def body(c, _):
            return feedback(fn(c), c), None

        def run(v):
            out, _ = jax.lax.scan(body, v, None, length=n)
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            return jnp.sum(leaf.astype(jnp.float32))

        return jax.jit(run)

    short, long_ = make(1), make(iters)
    for _ in range(warmup_reps):
        float(short(x))
        float(long_(x))

    def measure(f, tries=5):
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(f(x))  # scalar fetch forces execution
            best = min(best, time.perf_counter() - t0)
        return best

    # interleave the two loop lengths so clock/queue drift cancels
    t1 = tn = float("inf")
    for _ in range(3):
        t1 = min(t1, measure(short, tries=2))
        tn = min(tn, measure(long_, tries=2))
    ms = max((tn - t1) / (iters - 1) * 1e3, 1e-6)
    return BenchResult(name=name, ms=ms, ms_min=ms, ms_mean=ms, pixels=pixels)
