import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.ops.guided import _window_sum
from tpuimg.oracle import guided_filter_ref

log = open("guided_probe2.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

def box_stack(x, radius, border):  # x (C, H, W)
    ksz = 2 * radius + 1
    rows = _window_sum(x, radius, x.ndim - 1, border)
    return _window_sum(rows, radius, x.ndim - 2, border) * jnp.float32(1.0/(ksz*ksz))

def guided_stacked(I, pp, radius, eps):
    stack1 = jnp.stack([pp, I, I*pp, I*I])            # (4, H, W)
    m = box_stack(stack1, radius, "reflect101")
    mp, mI, mIp, mII = m[0], m[1], m[2], m[3]
    a = (mIp - mp*mI) / (mII - mI*mI + jnp.float32(eps))
    b = mp - a*mI
    mab = box_stack(jnp.stack([a, b]), radius, "reflect101")
    return mab[0]*I + mab[1]

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (2160, 3840), jnp.float32)
PIX = 2160*3840
g = jax.jit(functools.partial(guided_stacked, radius=8, eps=1e-3))
# correctness
sm = jax.random.uniform(key, (300, 400), jnp.float32)
ref = guided_filter_ref(np.asarray(sm), np.asarray(sm), 8, 1e-3, border="reflect101")
p(f"stacked maxdiff: {np.abs(np.asarray(g(sm, sm))-ref).max():.2e}")
r = time_stream_fn(lambda x: g(x, x), img, iters=30, pixels=PIX)
p(f"guided r8 stacked: {r.ms:.3f} ms {r.gpix_s:.2f}")
r = time_stream_fn(lambda x: tpuimg.guided_filter(x, x, 8, 1e-3, border="reflect101"), img, iters=30, pixels=PIX)
p(f"guided r8 current: {r.ms:.3f} ms {r.gpix_s:.2f}")
p("DONE")
