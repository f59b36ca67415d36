import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import tpuimg

log = open("mosaic_probe.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

key = jax.random.PRNGKey(0)
small_f = jax.random.uniform(key, (512, 640), jnp.float32)
small_u = jax.random.randint(key, (512, 640), 0, 256, jnp.int32).astype(jnp.uint8)

def try_case(name, fn):
    try:
        v = float(jnp.sum(fn().astype(jnp.float32)))
        p(f"{name}: OK ({v:.1f})")
    except Exception as e:
        p(f"{name}: FAIL {type(e).__name__} {str(e)[:120]}")

for r in (2, 3, 5, 7):
    try_case(f"gauss r{r}", lambda r=r: tpuimg.gaussian(small_f, r, 2.0, impl="pallas"))
try_case("erode r2 u8", lambda: tpuimg.erode(small_u, 2, impl="pallas"))
try_case("erode r2 i32", lambda: tpuimg.erode(small_u.astype(jnp.int32), 2, impl="pallas"))
try_case("erode r2 f32", lambda: tpuimg.erode(small_u.astype(jnp.float32), 2, impl="pallas"))
try_case("guided r2", lambda: tpuimg.guided_filter(small_f, small_f, 2, 1e-3, impl="pallas"))
try_case("guided r8", lambda: tpuimg.guided_filter(small_f, small_f, 8, 1e-3, impl="pallas"))
p("DONE")
