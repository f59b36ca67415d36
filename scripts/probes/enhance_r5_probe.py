"""Round-5 probe: CLAHE mapping fused INTO the enhance tail (VERDICT r4
item 2).

A/B at 4K on chip:
  old   = r4 pipeline (clahe _out_f32 blend frame -> enhance_tail_pallas)
  new   = r5 pipeline (enhance default: u8 + table bank -> blend recomputed
          in-kernel, enhance_tail_clahe_pallas)
plus staged for reference, plus end-to-end parity of the new path vs the
composed NumPy oracles (contract: <= 2 gray steps) at 4K and one odd size.

Appends results to docs/PERFORMANCE.md by hand afterwards; raw log to
/tmp/enhance_r5_probe.log via the driver shell.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TPUIMG_CACHE_DIR", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import tpuimg
from tpuimg.core.timing import sol_ms, time_stream_fn
from tpuimg.kernels.boxsum import enhance_tail_pallas
from tpuimg.pipeline import enhance

print(f"devices: {jax.devices()}", flush=True)
key = jax.random.PRNGKey(5)
img4k = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(
    jnp.uint8)
PIX = 2160 * 3840
SOL = sol_ms(2 * PIX)


def enhance_old(x):
    """The round-4 fused path: full-frame f32 blend through HBM + f32 tail."""
    blend = tpuimg.clahe(x, 2.0, 8, 8, _out_f32=True)
    f = blend * jnp.float32(1.0 / 255.0)
    out = enhance_tail_pallas(f, 2, 1.5, 8, 1e-3)
    return jnp.clip(jnp.rint(out * 255.0), 0.0, 255.0).astype(jnp.uint8)


for name, fn in [("new_fused_r5", lambda x: enhance(x)),
                 ("old_fused_r4", enhance_old),
                 ("staged", lambda x: enhance(x, impl="staged"))]:
    r = time_stream_fn(fn, img4k, iters=12, name=name, pixels=PIX, sol_ms=SOL)
    print(f"{name:14s} {r.ms:7.3f} ms  {r.gpix_s:6.2f} GPix/s  "
          f"(alt {r.ms_alt:7.3f}, SoL {SOL:5.3f})", flush=True)

# parity: new fused vs old fused (1-ulp blend scatter -> <=1 step), and new
# fused vs the composed NumPy oracle (<= 2 steps, the autotest contract)
from tpuimg.oracle import clahe_ref, gaussian_ref, guided_filter_ref


def oracle(img):
    eq = clahe_ref(img, 2.0, 8, 8)
    f = eq.astype(np.float32) / np.float32(255.0)
    sm = gaussian_ref(f, 2, 1.5)
    q = guided_filter_ref(f, sm, 8, 1e-3, border="reflect101")
    return np.clip(np.rint(q * 255.0), 0, 255).astype(np.uint8)


rng = np.random.default_rng(7)
for shape in [(2160, 3840), (1111, 2222)]:
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    new = np.asarray(enhance(jnp.asarray(img))).astype(int)
    old = np.asarray(enhance_old(jnp.asarray(img))).astype(int)
    ref = oracle(img).astype(int)
    print(f"{shape}: new-vs-old maxdiff {np.abs(new - old).max()}, "
          f"new-vs-oracle maxdiff {np.abs(new - ref).max()}", flush=True)
print("DONE", flush=True)
