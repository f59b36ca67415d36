import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.oracle import clahe_ref

log = open("clahe_probe.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()
key = jax.random.PRNGKey(0)
img = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = 2160*3840
r = time_stream_fn(lambda x: tpuimg.clahe(x, 40.0, 8, 8), img, iters=25, pixels=PIX)
p(f"clahe 4k (digit-split cdf gather): {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
r = time_stream_fn(tpuimg.hist_equalize, img, iters=25, pixels=PIX)
p(f"he 4k: {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
sm = jax.random.randint(key, (541, 733), 0, 256, jnp.int32).astype(jnp.uint8)
p(f"clahe maxdiff vs oracle: {np.abs(np.asarray(tpuimg.clahe(sm, 2.0, 8, 8)).astype(int) - clahe_ref(np.asarray(sm), 2.0, 8, 8).astype(int)).max()}")
p("DONE")
