import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.oracle import integral_ref

log = open("opt_probe4.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()
key = jax.random.PRNGKey(0)
img = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = 2160*3840
r = time_stream_fn(lambda x: tpuimg.integral(x, impl="pallas"), img, iters=30, pixels=PIX)
p(f"integral pallas (1-pass intile): {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
# exactness incl. saturated image (worst-case magnitudes)
sm = jax.random.randint(key, (541, 733), 0, 256, jnp.int32).astype(jnp.uint8)
p(f"rand exact: {np.array_equal(np.asarray(tpuimg.integral(sm, impl='pallas')), integral_ref(np.asarray(sm)))}")
ones = jnp.full((2160, 3840), 255, jnp.uint8)
p(f"saturated 4k exact: {np.array_equal(np.asarray(tpuimg.integral(ones, impl='pallas')), integral_ref(np.full((2160,3840),255,np.uint8)))}")
p("DONE")
