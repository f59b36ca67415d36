import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = open("gather_probe.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

# variant 1: jnp.take inside kernel
def k_take(tab_ref, x_ref, o_ref):
    o_ref[:] = jnp.take(tab_ref[0], x_ref[:].astype(jnp.int32), axis=0)

# variant 2: table[idx] via advanced indexing of a loaded array
def k_index(tab_ref, x_ref, o_ref):
    t = tab_ref[:]
    o_ref[:] = t[0, x_ref[:].astype(jnp.int32)]

tab = jnp.arange(256, dtype=jnp.float32)[None, :]  # (1, 256)
x = jax.random.randint(jax.random.PRNGKey(0), (256, 512), 0, 256, jnp.int32).astype(jnp.uint8)
for name, k in [("take", k_take), ("index", k_index)]:
    try:
        out = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(tab, x)
        ok = bool(jnp.all(out == x.astype(jnp.float32)))
        p(f"{name}: compiled, correct={ok}")
    except Exception as e:
        p(f"{name}: FAIL {type(e).__name__} {str(e)[:200]}")
p("DONE")
