import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.oracle import integral_ref

log = open("scan_probe.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()
key = jax.random.PRNGKey(0)
img = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = 2160*3840
sm = jax.random.randint(key, (541, 733), 0, 256, jnp.int32).astype(jnp.uint8)
try:
    p(f"fused exact: {np.array_equal(np.asarray(tpuimg.integral(sm, impl='pallas')), integral_ref(np.asarray(sm)))}")
    ones = jnp.full((2160, 3840), 255, jnp.uint8)
    p(f"saturated exact: {np.array_equal(np.asarray(tpuimg.integral(ones, impl='pallas')), integral_ref(np.full((2160,3840),255,np.uint8)))}")
    for trial in range(3):
        r = time_stream_fn(lambda x: tpuimg.integral(x, impl="pallas"), img, iters=100, pixels=PIX)
        p(f"fused 1-pass integral 4k (trial {trial}): {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
except Exception as e:
    p(f"FAIL {type(e).__name__} {str(e)[:200]}")
p("DONE")
