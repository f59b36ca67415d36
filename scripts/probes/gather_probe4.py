import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = open("gather_probe4.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()
key = jax.random.PRNGKey(0)

def mk(axis):
    def k(tab_ref, x_ref, o_ref):
        idx = x_ref[:].astype(jnp.int32)
        o_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=axis,
                                       mode="promise_in_bounds")
    return k

cases = [
    ("axis1 (8,128) f32", 1, (8, 128), 128, jnp.float32),
    ("axis1 (8,256) f32", 1, (8, 256), 256, jnp.float32),
    ("axis1 (256,128) f32", 1, (256, 128), 128, jnp.float32),
    ("axis0 (8,128) f32", 0, (8, 128), 8, jnp.float32),
    ("axis1 (8,128) i32", 1, (8, 128), 128, jnp.int32),
]
for name, axis, shape, hi, dtype in cases:
    tab = jax.random.uniform(key, shape, jnp.float32).astype(dtype)
    img = jax.random.randint(key, shape, 0, hi, jnp.int32)
    try:
        out = pl.pallas_call(
            mk(axis),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )(tab, img)
        ref = jnp.take_along_axis(tab, img, axis=axis)
        p(f"{name}: correct={bool(jnp.all(out == ref))}")
    except Exception as e:
        p(f"{name}: FAIL {type(e).__name__} {str(e)[:120]}")
p("DONE")
