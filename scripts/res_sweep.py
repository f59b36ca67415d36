import sys, os, json; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.core.timing import time_stream_fn

log = open("res_sweep.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

key = jax.random.PRNGKey(0)
results = {}
for name, (h, w) in [("1080p", (1080, 1920)), ("4k", (2160, 3840)), ("8k", (4320, 7680))]:
    u8 = jax.random.randint(key, (h, w), 0, 256, jnp.int32).astype(jnp.uint8)
    f32 = jax.random.uniform(key, (h, w), jnp.float32)
    pix = h * w
    res = {}
    for op, fn, arg, iters in [
        ("integral", lambda x: tpuimg.integral(x), u8, 60),
        ("hist_equalize", tpuimg.hist_equalize, u8, 60),
        ("clahe_8x8", lambda x: tpuimg.clahe(x, 2.0, 8, 8), u8, 30),
        ("gaussian_r2", lambda x: tpuimg.gaussian(x, 2, 1.5), f32, 60),
        ("erode_r15", lambda x: tpuimg.erode(x, 15), u8, 30),
    ]:
        try:
            r = time_stream_fn(fn, arg, iters=iters, pixels=pix)
            res[op] = {"ms": round(r.ms, 4), "gpix_s": round(r.gpix_s, 2)}
            p(f"{name} {op}: {r.ms:.3f} ms {r.gpix_s:.2f} GPix/s")
        except Exception as e:
            res[op] = {"error": str(e)[:150]}
            p(f"{name} {op}: FAIL {str(e)[:100]}")
    results[name] = res
with open("docs/resolution_sweep.json", "w") as f:
    json.dump(results, f, indent=2)
p("DONE")
