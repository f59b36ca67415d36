"""Benchmark harness: the five BASELINE.json configs on the local device.

Prints ONE JSON line with the headline metric — integral image at 4K in
GPix/s vs the reference's published 0.597 ms ≈ 13.9 GPix/s
(Integral/readme.md:23, the only directly comparable number) — and writes
all per-op results to BENCH_DETAIL.json (stderr carries the table).

Timing is device-side scan amortization (tpuimg.core.timing.time_scan_fn):
warm-up + N data-dependent iterations inside one jit, scalar fetch, latency
cancelled by differencing two loop lengths — the TPU equivalent of the
reference's GpuTimer + nrepeats discipline (SURVEY.md §4 pattern 4).
"""

from __future__ import annotations

import json
import sys

import jax

# Persistent compilation cache: first-ever run pays remote-compile cost
# (~1-4 min/program on this runtime); repeats are cheap.
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import tpuimg
from tpuimg.core.timing import time_scan_fn

REF_INTEGRAL_GPIX_S = 2160 * 3840 / 0.597e-3 / 1e9  # 13.9, Integral/readme.md:23


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    img4k_u8 = jax.random.randint(k1, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
    img4k_f = jax.random.uniform(k2, (2160, 3840), jnp.float32)
    img1080_f = jax.random.uniform(k3, (1080, 1920), jnp.float32)
    batch4k_u8 = jnp.tile(img4k_u8[None], (2, 1, 1))
    PIX4K, PIX1080 = 2160 * 3840, 1080 * 1920

    configs = [
        # (name, fn, arg, pixels, iters) — BASELINE.json configs 1-5; iters
        # sized so the measured loop dwarfs the ~25 ms fetch-latency noise
        ("gaussian_5x5_1080p", lambda x: tpuimg.gaussian(x, 2, 1.5), img1080_f,
         PIX1080, 400),
        ("integral_4k", tpuimg.integral, img4k_u8, PIX4K, 100),
        ("hist_equalize_4k", tpuimg.hist_equalize, img4k_u8, PIX4K, 100),
        ("clahe_4k_8x8", lambda x: tpuimg.clahe(x, 40.0, 8, 8), img4k_u8,
         PIX4K, 40),
        ("guided_r8_4k", lambda x: tpuimg.guided_filter(x, x, 8, 1e-3),
         img4k_f, PIX4K, 30),
        ("morph_31x31_4k_batch2", lambda x: tpuimg.dilate(tpuimg.erode(x, 15), 15),
         batch4k_u8, 2 * 2 * PIX4K, 30),
        ("enhance_pipeline_4k", lambda x: __import__(
            "tpuimg.pipeline", fromlist=["enhance"]).enhance(x), img4k_u8,
         PIX4K, 20),
    ]

    detail = {}
    for name, fn, arg, pix, iters in configs:
        try:
            r = time_scan_fn(fn, arg, iters=iters, name=name, pixels=pix)
            detail[name] = {"ms": r.ms, "gpix_s": r.gpix_s}
            print(f"{name:24s} {r.ms:9.3f} ms  {r.gpix_s:8.2f} GPix/s", file=sys.stderr)
        except Exception as e:  # keep the headline alive if one config breaks
            detail[name] = {"error": str(e)[:300]}
            print(f"{name:24s} ERROR {e}", file=sys.stderr)

    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)

    integral = detail.get("integral_4k", {})
    value = integral.get("gpix_s", 0.0)
    print(json.dumps({
        "metric": "integral_4k_gpix_s",
        "value": round(value, 2),
        "unit": "GPix/s",
        "vs_baseline": round(value / REF_INTEGRAL_GPIX_S, 2),
    }))


if __name__ == "__main__":
    main()
