"""Benchmark timing utilities.

TPU equivalent of the reference's ``GpuTimer`` (cudaEvent elapsed time,
`Integral/cuda_utils.h:134-161`) and warm-up discipline
(`GaussianFilter/gaussian.cu:484-491`): jit + warm-up calls, then wall-clock
around a scalar device fetch.

The streaming protocol (``time_stream_fn``) exists because two things make
naive timing dishonest on this runtime:

1. ``block_until_ready`` does not reliably block on tunneled platforms, and
   the host<->device round trip is ~25 ms — so per-call wall timing measures
   the tunnel, not the op.
2. A device-side ``lax.scan`` that feeds the op's output back as its input
   (the round-1 protocol) lets XLA keep the whole working set VMEM-resident:
   the op never streams from HBM and the measurement can exceed the HBM
   speed-of-light (round-1 committed a physically impossible 494 GPix/s).

Protocol: pre-stage a ring of F *distinct* frames in HBM sized to several
times VMEM, run N data-independent iterations inside one jitted ``fori_loop``
(iteration i consumes frame i mod F, so every iteration reads fresh
HBM-resident input), force each output to materialize with
``lax.optimization_barrier`` (so the HBM write isn't fused away into the
checksum), and difference two loop lengths so dispatch/transfer latency
cancels. A per-op speed-of-light floor (``sol_ms``) is asserted when known,
and the two-point fit is cross-checked against a third loop length —
disagreement beyond ``consistency_tol`` raises instead of publishing garbage.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

# HBM bandwidth used for speed-of-light floors (TPU v5e ~819 GB/s).
HBM_BYTES_PER_S = 819e9


@dataclass
class BenchResult:
    name: str
    ms: float  # per-iteration milliseconds (two-point streaming fit)
    ms_min: float
    ms_mean: float
    pixels: int | None = None
    ms_alt: float | None = None  # cross-check fit from the third loop length

    @property
    def gpix_s(self) -> float | None:
        if self.pixels is None:
            return None
        return self.pixels / (self.ms * 1e-3) / 1e9


def sol_ms(*byte_counts: float) -> float:
    """Speed-of-light milliseconds for the given HBM traffic (sum of bytes)."""
    return sum(byte_counts) / HBM_BYTES_PER_S * 1e3


def time_fn(fn, *args, warmup: int = 3, iters: int = 20, name: str = "op",
            pixels: int | None = None) -> BenchResult:
    """Wall-clock timing with warm-up — for hosts where ``block_until_ready``
    works (CPU backend, local devices). Not used for published TPU numbers."""
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


def _frame_ring(x, min_bytes: int = 256 * 1024 * 1024, max_frames: int = 32):
    """Stack F distinct frames (rolled copies of x) so the input working set
    exceeds any on-chip residency; F is a power of two for a cheap i % F."""
    frame_bytes = x.size * x.dtype.itemsize
    f = 1
    while f < max_frames and f * frame_bytes < min_bytes:
        f *= 2
    frames = jnp.stack(
        [jnp.roll(x, (11 * i) % max(x.shape[-1], 1), axis=-1) for i in range(f)]
    )
    return jax.block_until_ready(frames), f


def time_stream_fn(fn, x, *, iters: int = 32, warmup_reps: int = 2,
                   name: str = "op", pixels: int | None = None,
                   sol_ms: float | None = None,
                   consistency_tol: float = 0.25,
                   jit_wrapper=None) -> BenchResult:
    """Streaming-throughput timing: see the module docstring for the protocol.

    ``fn(frame)`` must accept one array shaped like ``x``. Raises
    RuntimeError if the measurement is faster than ``sol_ms`` (physically
    impossible) or if the two independent fits disagree by more than
    ``consistency_tol`` (relative).

    ``jit_wrapper`` overrides how the harness's top-level loop is jitted
    (default: ``op_jit`` with its scoped-vmem fallback). Probes use it
    to A/B compiler options — ``fn`` itself must then be un-jitted, since
    options on a nested jit are rejected by jax.
    """
    frames, f = _frame_ring(x)

    # frames and n are jit ARGUMENTS (a closed-over device array would be
    # embedded in the program as a constant — hundreds of MB per compile);
    # one compiled program serves every loop length. op_jit (not jax.jit):
    # the harness's top-level jit must carry the raised scoped-vmem limit
    # or ops that need it (enhance at 4K) fail to compile ONLY under the
    # harness (core/jit.py, round 3).
    from tpuimg.core.jit import op_jit

    wrap = op_jit() if jit_wrapper is None else jit_wrapper

    @wrap
    def run(frames_arg, n):
        def body(i, c):
            xi = jax.lax.dynamic_index_in_dim(
                frames_arg, jnp.remainder(i, f), 0, keepdims=False
            )
            out = fn(xi)
            if not isinstance(out, (tuple, list)):
                out = (out,)
            # EVERY output must enter the dependency chain: summing only
            # out[0] would let XLA dead-code-eliminate the other outputs
            # and time a fraction of the op (round-2 review finding). The
            # barrier forces the full buffers to materialize; the checksum
            # then reads only one row each, so measured traffic is the
            # op's own read+write and nothing else.
            out = jax.lax.optimization_barrier(tuple(out))
            acc = c
            for o in out:
                chk = o[..., :1, :] if o.ndim >= 2 else o
                acc = acc + jnp.sum(chk.astype(jnp.float32))
            return acc

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def measure(n, tries=3):
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(run(frames, jnp.int32(n)))  # scalar fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    for _ in range(warmup_reps):
        float(run(frames, jnp.int32(2)))

    # Adapt loop lengths to the op: the host<->device round trip on this
    # runtime is ~25 ms with ms-scale jitter, so the *differenced* span must
    # dwarf it. Aim for ~150 ms of device work at n_hi.
    est = max((measure(64, tries=2) - measure(4, tries=2)) / 60, 1e-6)
    n_hi = int(min(max(iters, 0.150 / est), 8192))
    n_mid = max(2, n_hi // 2)
    n_lo = max(1, n_hi // 4)
    if n_mid >= n_hi:
        n_hi = n_mid + 1
    lengths = (n_lo, n_mid, n_hi)

    # interleave loop lengths so clock/queue drift cancels
    t = {n: float("inf") for n in lengths}
    for _ in range(3):
        for n in lengths:
            t[n] = min(t[n], measure(n, tries=2))

    ms = (t[n_hi] - t[n_mid]) / (n_hi - n_mid) * 1e3
    ms_alt = (t[n_mid] - t[n_lo]) / (n_mid - n_lo) * 1e3
    if jax.default_backend() == "cpu":
        # hermetic-test path: numbers are never published from CPU runs and
        # tiny test shapes are noise-dominated — skip the physicality gates
        ms = max(ms, 1e-6)
        return BenchResult(name=name, ms=ms, ms_min=ms, ms_mean=ms,
                           pixels=pixels, ms_alt=ms_alt)
    if ms <= 0 or ms_alt <= 0:
        raise RuntimeError(
            f"{name}: non-positive per-iteration time (ms={ms:.5f}, "
            f"alt={ms_alt:.5f}) — loop lengths too short for this op"
        )
    rel = abs(ms - ms_alt) / max(ms, ms_alt)
    if rel > consistency_tol:
        raise RuntimeError(
            f"{name}: streaming fits disagree ({ms:.4f} vs {ms_alt:.4f} ms, "
            f"{rel:.0%} > {consistency_tol:.0%}) — measurement unstable"
        )
    if sol_ms is not None and ms < sol_ms * 0.98:
        raise RuntimeError(
            f"{name}: measured {ms:.4f} ms is faster than the HBM "
            f"speed-of-light {sol_ms:.4f} ms — harness artifact, not a result"
        )
    return BenchResult(name=name, ms=ms, ms_min=min(ms, ms_alt),
                       ms_mean=(ms + ms_alt) / 2, pixels=pixels, ms_alt=ms_alt)
