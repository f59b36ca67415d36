import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn

log = open("opt_probe2.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

key = jax.random.PRNGKey(0)
img = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = 2160*3840
def t(name, fn, arg=img, iters=25):
    try:
        r = time_stream_fn(fn, arg, iters=iters, pixels=PIX)
        p(f"{name}: {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
    except Exception as e:
        p(f"{name}: FAIL {str(e)[:150]}")

t("he 4k (int8 hist)", tpuimg.hist_equalize)
t("clahe 4k (optimized)", lambda x: tpuimg.clahe(x, 40.0, 8, 8))
t("integral 4k pallas (mxu scan)", lambda x: tpuimg.integral(x, impl="pallas"))
# verify correctness of new paths on device
from tpuimg.oracle import clahe_ref, integral_ref, hist_equalize_ref
sm = jax.random.randint(key, (541, 733), 0, 256, jnp.int32).astype(jnp.uint8)
smn = np.asarray(sm)
p(f"clahe exact: {np.abs(np.asarray(tpuimg.clahe(sm, 2.0, 8, 8)).astype(int) - clahe_ref(smn, 2.0, 8, 8).astype(int)).max()}")
p(f"he exact: {np.array_equal(np.asarray(tpuimg.hist_equalize(sm)), hist_equalize_ref(smn))}")
p(f"integral pallas exact: {np.array_equal(np.asarray(tpuimg.integral(sm, impl='pallas')), integral_ref(smn))}")
p("DONE")
