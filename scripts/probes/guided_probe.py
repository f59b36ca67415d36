import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import numpy as np
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.core.borders import pad_mode

log = open("guided_probe.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (2160, 3840), jnp.float32)
PIX = 2160*3840

# variant: direct shift-add window sums instead of cumsum-diff
def _window_sum_direct(x, radius, axis, border):
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x, pad, mode=pad_mode(border))
    acc = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    for k in range(1, 2 * radius + 1):
        acc = acc + jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
    return acc

def box_direct(x, radius):
    ksz = 2 * radius + 1
    rows = _window_sum_direct(x, radius, 1, "reflect101")
    return _window_sum_direct(rows, radius, 0, "reflect101") * jnp.float32(1.0/(ksz*ksz))

def guided_direct(I, pp, radius, eps):
    box = lambda v: box_direct(v, radius)
    mp, mI = box(pp), box(I)
    mIp, mII = box(I*pp), box(I*I)
    a = (mIp - mp*mI) / (mII - mI*mI + jnp.float32(eps))
    b = mp - a*mI
    return box(a)*I + box(b)

for r in (4, 8):
    t = time_stream_fn(lambda x, r=r: tpuimg.guided_filter(x, x, r, 1e-3, border="reflect101"), img, iters=25, pixels=PIX)
    p(f"guided r{r} cumsum-diff: {t.ms:.3f} ms {t.gpix_s:.2f}")
    t = time_stream_fn(jax.jit(lambda x, r=r: guided_direct(x, x, r, 1e-3)), img, iters=25, pixels=PIX)
    p(f"guided r{r} shift-add:   {t.ms:.3f} ms {t.gpix_s:.2f}")
# box filter alone both ways
t = time_stream_fn(jax.jit(lambda x: box_direct(x, 8)), img, iters=25, pixels=PIX)
p(f"box r8 shift-add: {t.ms:.3f} ms {t.gpix_s:.2f}")
t = time_stream_fn(lambda x: tpuimg.box_filter(x, 8, border="reflect101"), img, iters=25, pixels=PIX)
p(f"box r8 cumsum:    {t.ms:.3f} ms {t.gpix_s:.2f}")
p("DONE")
