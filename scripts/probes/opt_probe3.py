import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.oracle import clahe_ref, integral_ref

log = open("opt_probe3.log", "a")
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

t("clahe 4k (flipconcat+int8hist, HIGHEST map)", lambda x: tpuimg.clahe(x, 40.0, 8, 8))
t("integral 4k pallas (mxu scan, cast fix)", lambda x: tpuimg.integral(x, impl="pallas"))
sm = jax.random.randint(key, (541, 733), 0, 256, jnp.int32).astype(jnp.uint8)
smn = np.asarray(sm)
p(f"clahe maxdiff vs oracle: {np.abs(np.asarray(tpuimg.clahe(sm, 2.0, 8, 8)).astype(int) - clahe_ref(smn, 2.0, 8, 8).astype(int)).max()}")
p(f"integral pallas exact: {np.array_equal(np.asarray(tpuimg.integral(sm, impl='pallas')), integral_ref(smn))}")
p("DONE")
