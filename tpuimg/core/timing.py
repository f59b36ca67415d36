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
