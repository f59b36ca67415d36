import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import tpuimg

log = open("mosaic_probe3.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

key = jax.random.PRNGKey(0)
def probe(name, fn):
    try:
        v = float(jnp.sum(fn().astype(jnp.float32)))
        p(f"{name}: OK")
    except Exception as e:
        p(f"{name}: FAIL {str(e)[:100]}")

for w in (1280, 1920, 2048, 2560, 3840):
    f = jax.random.uniform(key, (256, w), jnp.float32)
    probe(f"guided r8 w={w}", lambda f=f: tpuimg.guided_filter(f, f, 8, 1e-3, impl="pallas"))
u = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
probe("erode r2 u8(upcast) 4k", lambda: tpuimg.erode(u, 2, impl="pallas"))
probe("erode r6 u8(upcast) 4k", lambda: tpuimg.erode(u, 6, impl="pallas"))
p("DONE")
