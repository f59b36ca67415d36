import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpuimg.core.timing import time_stream_fn

log = open("gather_probe2.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

key = jax.random.PRNGKey(0)
H, W = 2160, 3840
img = jax.random.randint(key, (H, W), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = H*W
tabW = jax.random.uniform(key, (256, W), jnp.float32)

# XLA-level take_along_axis
def xla_taa(x):
    idx = x.astype(jnp.int32)
    return jnp.take_along_axis(tabW, idx, axis=0)
try:
    r = time_stream_fn(jax.jit(lambda x: xla_taa(x).astype(jnp.uint8)), img, iters=20, pixels=PIX)
    p(f"XLA take_along_axis (256,W)->(H,W): {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
except Exception as e:
    p(f"XLA taa FAIL {str(e)[:150]}")

# Pallas kernel: block rows of idx, full table in VMEM
def k(tab_ref, x_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(tab_ref[:], x_ref[:].astype(jnp.int32), axis=0)
def pallas_taa(x):
    return pl.pallas_call(
        k,
        grid=(H // 216,),
        in_specs=[pl.BlockSpec((256, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((216, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((216, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
    )(tabW, x)
try:
    out = pallas_taa(img)
    ref = xla_taa(img)
    p(f"pallas taa correct: {bool(jnp.all(out == ref))}")
    r = time_stream_fn(jax.jit(lambda x: pallas_taa(x).astype(jnp.uint8)), img, iters=20, pixels=PIX)
    p(f"pallas taa: {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
except Exception as e:
    p(f"pallas taa FAIL {type(e).__name__} {str(e)[:200]}")
p("DONE")
