import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.oracle import clahe_ref, hist_equalize_ref

log = open("lut_probe.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()
key = jax.random.PRNGKey(0)
img = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = 2160*3840
sm = jax.random.randint(key, (541, 733), 0, 256, jnp.int32).astype(jnp.uint8)
smn = np.asarray(sm)
try:
    p(f"he gather exact: {np.array_equal(np.asarray(tpuimg.hist_equalize(sm)), hist_equalize_ref(smn))}")
    r = time_stream_fn(tpuimg.hist_equalize, img, iters=25, pixels=PIX)
    p(f"he 4k (gather LUT): {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
except Exception as e:
    p(f"he FAIL {type(e).__name__} {str(e)[:200]}")
try:
    d = np.abs(np.asarray(tpuimg.clahe(sm, 2.0, 8, 8)).astype(int) - clahe_ref(smn, 2.0, 8, 8).astype(int)).max()
    p(f"clahe gather maxdiff: {d}")
    r = time_stream_fn(lambda x: tpuimg.clahe(x, 40.0, 8, 8), img, iters=25, pixels=PIX)
    p(f"clahe 4k (gather map): {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
except Exception as e:
    p(f"clahe FAIL {type(e).__name__} {str(e)[:200]}")
p("DONE")
