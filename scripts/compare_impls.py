"""Pallas-vs-XLA comparison on the local device; appends to compare_impls.log."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import tpuimg
from tpuimg.core.timing import time_stream_fn

key = jax.random.PRNGKey(0)
img_u8 = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
img_f = jax.random.uniform(key, (2160, 3840), jnp.float32)
PIX = 2160 * 3840
cases = [
    ("integral xla", lambda x: tpuimg.integral(x, impl="xla"), img_u8),
    ("integral pallas", lambda x: tpuimg.integral(x, impl="pallas"), img_u8),
    # explicit impl on BOTH rows: the auto default dispatches to the round-3
    # winner, so a bare call would mislabel the ladder
    ("gauss r1 xla", lambda x: tpuimg.gaussian(x, 1, 1.0, impl="xla"), img_f),
    ("gauss r1 pallas", lambda x: tpuimg.gaussian(x, 1, 1.0, impl="pallas"), img_f),
    ("gauss r7 xla", lambda x: tpuimg.gaussian(x, 7, 3.0, impl="xla"), img_f),
    ("gauss r7 pallas", lambda x: tpuimg.gaussian(x, 7, 3.0, impl="pallas"), img_f),
    ("guided r8 xla", lambda x: tpuimg.guided_filter(x, x, 8, 1e-3, border="reflect101", impl="xla"), img_f),
    ("guided r8 pallas", lambda x: tpuimg.guided_filter(x, x, 8, 1e-3, border="reflect101", impl="pallas"), img_f),
    ("erode r2 xla", lambda x: tpuimg.erode(x, 2, impl="xla"), img_u8),
    ("erode r2 pallas", lambda x: tpuimg.erode(x, 2, impl="pallas"), img_u8),
    ("erode r6 xla", lambda x: tpuimg.erode(x, 6, impl="xla"), img_u8),
    ("erode r6 pallas", lambda x: tpuimg.erode(x, 6, impl="pallas"), img_u8),
    ("erode r15 xla", lambda x: tpuimg.erode(x, 15, impl="xla"), img_u8),
    ("erode r15 pallas", lambda x: tpuimg.erode(x, 15, impl="pallas"), img_u8),
    ("erode r25 xla", lambda x: tpuimg.erode(x, 25, impl="xla"), img_u8),
    ("erode r25 pallas", lambda x: tpuimg.erode(x, 25, impl="pallas"), img_u8),
    ("guided r12 xla", lambda x: tpuimg.guided_filter(x, x, 12, 1e-3, border="reflect101", impl="xla"), img_f),
    ("guided r12 pallas", lambda x: tpuimg.guided_filter(x, x, 12, 1e-3, border="reflect101", impl="pallas"), img_f),
    ("guided r16 xla", lambda x: tpuimg.guided_filter(x, x, 16, 1e-3, border="reflect101", impl="xla"), img_f),
    ("guided r16 pallas", lambda x: tpuimg.guided_filter(x, x, 16, 1e-3, border="reflect101", impl="pallas"), img_f),
    ("he xla", lambda x: tpuimg.hist_equalize(x, impl="xla"), img_u8),
    ("he pallas", lambda x: tpuimg.hist_equalize(x, impl="pallas"), img_u8),
    ("clahe xla", lambda x: tpuimg.clahe(x, 40.0, 8, 8, impl="xla"), img_u8),
    ("clahe pallas", lambda x: tpuimg.clahe(x, 40.0, 8, 8, impl="pallas"), img_u8),
]
with open("compare_impls.log", "a") as log:
    for name, fn, arg in cases:
        t0 = time.perf_counter()
        try:
            r = time_stream_fn(fn, arg, iters=30, pixels=PIX)
            line = f"{name:18s} {r.ms:8.3f} ms {r.gpix_s:8.2f} GPix/s  ({time.perf_counter()-t0:.0f}s)"
        except Exception as e:
            line = f"{name:18s} ERROR {type(e).__name__}: {str(e)[:200]}"
        print(line, flush=True)
        log.write(line + "\n"); log.flush()
    log.write("DONE\n")
