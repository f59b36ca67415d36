"""Round 3: does the in-kernel-border Pallas gaussian hold its 4K
throughput at 8K, where the f32 frame (133 MB) exceeds VMEM residency and
the XLA pyramid needs the column-strip workaround (ops/gaussian.py)?

Run: python scripts/probes/gauss8k_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tpuimg
from tpuimg.core.timing import time_stream_fn


def main():
    print(jax.devices())
    key = jax.random.PRNGKey(0)
    for (h, w), tag in [((4320, 7680), "8K"), ((2160, 3840), "4K")]:
        img = jax.random.uniform(key, (h, w), jnp.float32)
        pix = h * w
        for r, s in [(1, 1.0), (7, 3.0)]:
            for impl in ("xla", "pallas"):
                fn = lambda x: tpuimg.gaussian(x, r, s, impl=impl)
                try:
                    t = time_stream_fn(fn, img, iters=12, pixels=pix)
                    print(f"{tag} gauss r{r} {impl:6s}: {t.ms:7.3f} ms  "
                          f"{t.gpix_s:6.2f} GPix/s", flush=True)
                except Exception as e:
                    print(f"{tag} gauss r{r} {impl:6s}: FAILED "
                          f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
