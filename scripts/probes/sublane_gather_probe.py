"""Does Mosaic lower take_along_axis along axis=0 (sublane gather)?
If yes, CLAHE mapping can pre-blend x into per-column tables R1/R2 and do
2 gathers/pixel instead of 4."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(tab_ref, idx_ref, o_ref):
    idx = idx_ref[:].astype(jnp.int32)
    o_ref[:] = jnp.take_along_axis(
        jnp.broadcast_to(tab_ref[:], (256, 128)), idx, axis=0,
        mode="promise_in_bounds")

rng = np.random.default_rng(0)
tab = jnp.asarray(rng.random((256, 128), dtype=np.float32))
idx = jnp.asarray(rng.integers(0, 256, (64, 128), dtype=np.int32))
try:
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
    )(tab, idx)
    ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
    print("sublane gather works, exact:", bool((np.asarray(out) == ref).all()))
except Exception as e:
    print("sublane gather UNSUPPORTED:", str(e)[:300])
