import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.oracle import integral_ref

log = open("tpu_pallas_check.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

key = jax.random.PRNGKey(0)
img_u8 = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
img_f = jax.random.uniform(key, (2160, 3840), jnp.float32)
PIX = 2160*3840

# correctness of pallas integral on real TPU (small fetch)
small = jax.random.randint(key, (300, 700), 0, 256, jnp.int32).astype(jnp.uint8)
out = np.asarray(tpuimg.integral(small, impl="pallas"))
p(f"integral pallas exact on TPU: {np.array_equal(out, integral_ref(np.asarray(small)))}")

r = time_stream_fn(lambda x: tpuimg.integral(x, impl="pallas"), img_u8, iters=30, pixels=PIX)
p(f"integral pallas 4k: {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")

# retry erode r2 pallas in fresh process state
try:
    r = time_stream_fn(lambda x: tpuimg.erode(x, 2, impl="pallas"), img_u8, iters=20, pixels=PIX)
    p(f"erode r2 pallas: {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
except Exception as e:
    p(f"erode r2 pallas ERROR {type(e).__name__}: {str(e)[:300]}")
try:
    r = time_stream_fn(lambda x: tpuimg.gaussian(x, 7, 3.0, impl="pallas"), img_f, iters=20, pixels=PIX)
    p(f"gauss r7 pallas: {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
except Exception as e:
    p(f"gauss r7 pallas ERROR {type(e).__name__}: {str(e)[:300]}")
try:
    r = time_stream_fn(lambda x: tpuimg.guided_filter(x, x, 8, 1e-3, border="reflect101", impl="pallas"), img_f, iters=20, pixels=PIX)
    p(f"guided r8 pallas: {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
except Exception as e:
    p(f"guided r8 pallas ERROR {type(e).__name__}: {str(e)[:300]}")
p("DONE")
