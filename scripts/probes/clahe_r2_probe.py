"""Round-2 CLAHE isolation: where do the ~0.8 ms at 4K go?
(ext construction + tile transpose | tile hists | LUT build | band mapping)"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tpuimg
from tpuimg.core.timing import time_stream_fn

key = jax.random.PRNGKey(0)
img = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = 2160 * 3840
h, w, xt, yt = 2160, 3840, 8, 8
tw, th = w // xt, h // yt


@jax.jit
def ext_tiles(x):
    # CLAHE needs no padding at 4K 8x8 (w,h divisible); this is the tile
    # regroup (transpose) feeding the hist kernel
    t = x.reshape(yt, th, xt, tw).transpose(0, 2, 1, 3)
    return t.reshape(yt * xt, th * tw)


@jax.jit
def tile_hists(x):
    from tpuimg.kernels.hist import hist256_groups_pallas

    return hist256_groups_pallas(ext_tiles(x))


@jax.jit
def hists_to_tables(x):
    from tpuimg.ops.histogram import _clip_redistribute

    hists = tile_hists(x)
    hists = _clip_redistribute(hists, int(tw * th * 40.0 / 256 + 0.5))
    return jnp.cumsum(hists, axis=-1).astype(jnp.float32) * jnp.float32(
        255.0 / (tw * th))


for name, fn in [
    ("regroup only", ext_tiles),
    ("regroup+hists", tile_hists),
    ("...+clip+cdf", hists_to_tables),
    ("full clahe", lambda x: tpuimg.clahe(x, 40.0, 8, 8)),
]:
    r = time_stream_fn(fn, img, iters=24, pixels=PIX)
    print(f"{name:16s} {r.ms:8.3f} ms", flush=True)
print("DONE", flush=True)
