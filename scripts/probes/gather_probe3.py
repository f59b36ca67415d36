import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpuimg.core.timing import time_stream_fn

log = open("gather_probe3.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

key = jax.random.PRNGKey(0)

def k(tab_ref, x_ref, o_ref):
    idx = x_ref[:].astype(jnp.int32)
    o_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=0,
                                   mode="promise_in_bounds")

for W, dtype in [(512, jnp.float32), (512, jnp.uint8), (3840, jnp.float32)]:
    tab = jax.random.uniform(key, (256, W), jnp.float32).astype(dtype)
    img = jax.random.randint(key, (256, W), 0, 256, jnp.int32).astype(jnp.uint8)
    try:
        out = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, W), dtype),
        )(tab, img)
        ref = jnp.take_along_axis(tab, img.astype(jnp.int32), axis=0)
        p(f"W={W} {dtype.__name__}: correct={bool(jnp.all(out == ref))}")
    except Exception as e:
        p(f"W={W} {dtype.__name__}: FAIL {type(e).__name__} {str(e)[:160]}")

# timing at 4K: grid over 256-row chunks, fixed table
H, W = 2304, 3840
imgH = jax.random.randint(key, (H, W), 0, 256, jnp.int32).astype(jnp.uint8)
tab = jax.random.uniform(key, (256, W), jnp.float32)
def lutg(x):
    return pl.pallas_call(
        k,
        grid=(H // 256,),
        in_specs=[pl.BlockSpec((256, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((256, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
    )(tab, x)
try:
    r = time_stream_fn(jax.jit(lambda x: lutg(x).astype(jnp.uint8)), imgH, iters=25, pixels=H*W)
    p(f"pallas dynamic_gather LUT 4k: {r.ms:.3f} ms {H*W/(r.ms*1e-3)/1e9:.2f} GPix/s")
except Exception as e:
    p(f"timing FAIL {type(e).__name__} {str(e)[:160]}")
p("DONE")
