"""Round-2 probe: guided one-pass vs two-pass vs strip width; u8-native vs
i32-widened morphology engine."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.kernels import boxsum, sep_stencil

key = jax.random.PRNGKey(0)
img_f = jax.random.uniform(key, (2160, 3840), jnp.float32)
img_u8 = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = 2160 * 3840


def bench(name, fn, arg, check=None, tol=None):
    try:
        out = np.asarray(fn(arg))
        if check is not None:
            d = np.abs(out.astype(np.float64) - check).max()
            if tol is not None and d > tol:
                print(f"{name:28s} WRONG maxdiff={d:g}", flush=True)
                return
        r = time_stream_fn(fn, arg, iters=24, pixels=PIX)
        print(f"{name:28s} {r.ms:8.3f} ms {r.gpix_s:8.2f} GPix/s", flush=True)
    except Exception as e:
        print(f"{name:28s} ERROR {str(e)[:180]}", flush=True)


# --- guided variants ---
ref8 = np.asarray(tpuimg.guided_filter(img_f, img_f, 8, 1e-3,
                                       border="reflect101", impl="xla"),
                  np.float64)
bench("guided r8 onepass s2048",
      lambda x: boxsum.guided_filter_pallas(x, x, 8, 1e-3, variant="onepass"),
      img_f, ref8, 1e-3)
orig = boxsum._MAX_STRIP
boxsum._MAX_STRIP = 4096
bench("guided r8 onepass nostrip",
      jax.jit(lambda x: boxsum.guided_filter_pallas(x, x, 8, 1e-3,
                                                    variant="onepass")),
      img_f, ref8, 1e-3)
boxsum._MAX_STRIP = orig
bench("guided r8 twopass s2048",
      lambda x: boxsum.guided_filter_pallas(x, x, 8, 1e-3, variant="twopass"),
      img_f, ref8, 1e-3)
bench("guided r4 onepass",
      lambda x: boxsum.guided_filter_pallas(x, x, 4, 1e-3, variant="onepass"),
      img_f)

# --- morphology: u8-native engine vs i32 widen ---
for r in (2, 15, 25):
    refm = np.asarray(tpuimg.erode(img_u8, r, impl="xla"), np.float64)
    bench(f"erode r{r} i32-widen",
          lambda x, r=r: sep_stencil.morphology_pallas(x, r, 0), img_u8,
          refm, 0)
    bench(f"erode r{r} u8-native",
          lambda x, r=r: sep_stencil._sep_stencil(x, r, None, True,
                                                  "replicate"),
          img_u8, refm, 0)
print("DONE", flush=True)
