import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn

log = open("mosaic_probe2.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

key = jax.random.PRNGKey(0)
img_u8 = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
img_f = jax.random.uniform(key, (2160, 3840), jnp.float32)
PIX = 2160*3840

cases = [
  ("gauss r1 pallas 4k", lambda: time_stream_fn(lambda x: tpuimg.gaussian(x, 1, 1.0, impl="pallas"), img_f, iters=30, pixels=PIX)),
  ("gauss r7 pallas 4k", lambda: time_stream_fn(lambda x: tpuimg.gaussian(x, 7, 3.0, impl="pallas"), img_f, iters=30, pixels=PIX)),
  ("erode r2 pallas 4k", lambda: time_stream_fn(lambda x: tpuimg.erode(x, 2, impl="pallas"), img_u8, iters=30, pixels=PIX)),
  ("erode r6 pallas 4k", lambda: time_stream_fn(lambda x: tpuimg.erode(x, 6, impl="pallas"), img_u8, iters=30, pixels=PIX)),
  ("guided r8 pallas 4k", lambda: time_stream_fn(lambda x: tpuimg.guided_filter(x, x, 8, 1e-3, border="reflect101", impl="pallas"), img_f, iters=30, pixels=PIX)),
  ("guided r4 pallas 4k", lambda: time_stream_fn(lambda x: tpuimg.guided_filter(x, x, 4, 1e-3, border="reflect101", impl="pallas"), img_f, iters=30, pixels=PIX)),
]
for name, run in cases:
    try:
        r = run()
        p(f"{name}: {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
    except Exception as e:
        p(f"{name}: FAIL {type(e).__name__} {str(e)[:150]}")
# correctness spot-check on TPU
from tpuimg.oracle import erode_ref, gaussian_ref
small_u = np.asarray(jax.random.randint(key, (300, 500), 0, 256, jnp.int32).astype(jnp.uint8))
p(f"erode r3 pallas exact on TPU: {np.array_equal(np.asarray(tpuimg.erode(small_u, 3, impl='pallas')), erode_ref(small_u, 3))}")
small_f = np.asarray(jax.random.uniform(key, (300, 500), jnp.float32))
p(f"gauss r2 pallas maxdiff on TPU: {np.abs(np.asarray(tpuimg.gaussian(small_f, 2, 1.5, impl='pallas'))-gaussian_ref(small_f,2,1.5)).max():.2e}")
p("DONE")
