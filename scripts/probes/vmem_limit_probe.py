"""A/B the raised xla_tpu_scoped_vmem_limit_kib on the hot standalone ops.

Round-3 question: commit d02d225 raised the scoped-vmem limit to 64 MiB on
EVERY public op's jit boundary (core/jit.py) to fix a hard compile failure
in the 4K enhance pipeline. But the negative-results list already records
that raising Mosaic's vmem_limit_bytes makes kernels SLOWER ("the compiler
schedules better against its default limit"), and BENCH_DETAIL.json taken
after that commit shows guided r8 at 0.76 ms vs the round-2 0.588 — inside
chip variance or a real regression? Measure the SAME jitted program with
default vs raised scoped-vmem limit, interleaved A/B/A/B to cancel drift.

Run: python scripts/probes/vmem_limit_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpuimg.core.jit import TPU_COMPILER_OPTIONS
from tpuimg.core.timing import time_stream_fn
from tpuimg.kernels.boxsum import guided_filter_pallas
from tpuimg.kernels.sep_stencil import gaussian_pallas
from tpuimg.kernels.scan2d import integral_pallas


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    img_f = jnp.asarray(rng.random((2160, 3840), np.float32))
    img_u8 = jnp.asarray(rng.integers(0, 256, (2160, 3840), np.uint8))

    raw_guided = guided_filter_pallas.__wrapped__
    raw_gauss = gaussian_pallas  # not op_jit-wrapped at the kernel layer

    cases = [
        ("guided_r8_self",
         lambda x: raw_guided(x, x, 8, 1e-3, "onepass", True), img_f),
        ("gauss_r2", lambda x: raw_gauss(x, 2, 1.5), img_f),
        ("integral", integral_pallas.__wrapped__, img_u8),
    ]
    default_jit = jax.jit
    raised_jit = lambda f: jax.jit(f, compiler_options=TPU_COMPILER_OPTIONS)
    for name, fn, arg in cases:
        # interleave to cancel clock drift; jit_wrapper controls the
        # TOP-LEVEL jit (nested compiler_options are rejected by jax)
        for rep in range(3):
            rd = time_stream_fn(fn, arg, name=name, jit_wrapper=default_jit)
            rr = time_stream_fn(fn, arg, name=name, jit_wrapper=raised_jit)
            print(f"{name} rep{rep}: default {rd.ms:.4f} ms   "
                  f"raised64M {rr.ms:.4f} ms", flush=True)


if __name__ == "__main__":
    main()
