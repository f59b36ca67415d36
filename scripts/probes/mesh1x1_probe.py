import numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.sharding import Mesh
import tpuimg
from tpuimg.parallel.sharding import guided_filter_sharded, stencil_sharded
from tpuimg.core.timing import time_stream_fn

print(jax.devices())
dev = jax.devices()[:1]
mesh = Mesh(np.array(dev).reshape(1, 1), ("data", "sp"))

rng = np.random.default_rng(0)
I = jnp.asarray(rng.random((2160, 3840), dtype=np.float32))

# local pallas guided r8 self-guided
r, eps = 8, 1e-3
local = lambda x: tpuimg.guided_filter(x, x, r, eps, border="reflect101")
sh_fn = guided_filter_sharded(mesh, r, eps, self_guided=True)
sharded = lambda x: sh_fn(x)

# correctness
a = np.asarray(local(I)); b = np.asarray(sharded(I))
print("guided 1x1 maxdiff:", float(np.abs(a - b).max()))

t_local = time_stream_fn(local, I, name="guided_local")
t_shard = time_stream_fn(sharded, I, name="guided_1x1mesh")
print(f"guided r8 4K: local {t_local.ms:.3f} ms, 1x1-mesh {t_shard.ms:.3f} ms")

