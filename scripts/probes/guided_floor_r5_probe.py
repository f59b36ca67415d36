"""Round-5 probe: the two windowed-mean angles ROUND4_NOTES cited without
recorded numbers (VERDICT r4 item 3) — measured, with accuracy, at the
flagship config (4K, r=8, self-guided, reflect-101, 1/ksz^2).

1. cumsum-diff: window sum = c[i+ksz] - c[i] on full-frame cumsums — this is
   exactly the XLA chain's _window_sum large-radius branch
   (ops/guided.py:61-67), timed here against the Pallas one-pass kernel.
2. integral-based: one 2D f32 integral image per stream, every window sum =
   4 corner reads (gIntegralToMean generalized). O(1)/px like cumsum-diff
   but with ONE shared prefix array per stream; accuracy is the known risk
   (f32 prefix magnitudes ~4M at 4K -> catastrophic cancellation in the
   4-corner difference).
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
from tpuimg.oracle import guided_filter_ref

R, EPS = 8, 1e-3
KSZ = 2 * R + 1
COEF = jnp.float32(1.0 / (KSZ * KSZ))

print(f"devices: {jax.devices()}", flush=True)
key = jax.random.PRNGKey(9)
img = jax.random.uniform(key, (2160, 3840), jnp.float32)
PIX = 2160 * 3840
SOL = sol_ms(2 * PIX * 4)


def box_integral(xp):
    """Box window sum of a PRE-PADDED (h+2r, w+2r) array via one integral
    image + 4 corner reads."""
    ii = jnp.cumsum(jnp.cumsum(xp, axis=0), axis=1)
    ii = jnp.pad(ii, ((1, 0), (1, 0)))
    h = xp.shape[0] - 2 * R
    w = xp.shape[1] - 2 * R
    return (ii[KSZ : KSZ + h, KSZ : KSZ + w] - ii[:h, KSZ : KSZ + w]
            - ii[KSZ : KSZ + h, :w] + ii[:h, :w])


@jax.jit
def guided_integral(I):
    Ip = jnp.pad(I, R, mode="reflect")
    mean_I = box_integral(Ip) * COEF
    mean_II = box_integral(Ip * Ip) * COEF
    a = (mean_II - mean_I * mean_I) / (
        mean_II - mean_I * mean_I + jnp.float32(EPS))
    b = mean_I - a * mean_I
    ap = jnp.pad(a, R, mode="reflect")
    bp = jnp.pad(b, R, mode="reflect")
    return box_integral(ap) * COEF * I + box_integral(bp) * COEF


variants = [
    ("pallas_onepass(shipped)",
     lambda x: tpuimg.guided_filter(x, x, R, EPS, border="reflect101")),
    ("xla_cumsum_diff",
     lambda x: tpuimg.guided_filter(x, x, R, EPS, border="reflect101",
                                    impl="xla")),
    ("integral_4corner", guided_integral),
]
small = np.asarray(img[:540, :960])
ref_small = guided_filter_ref(small, small, R, EPS, border="reflect101")
for name, fn in variants:
    r = time_stream_fn(fn, img, iters=16, name=name, pixels=PIX, sol_ms=SOL)
    err_small = np.abs(np.asarray(fn(jnp.asarray(small))) - ref_small).max()
    # full-4K error vs the shipped kernel (oracle at 4K is minutes of NumPy)
    err4k = np.abs(np.asarray(fn(img)) - np.asarray(variants[0][1](img))).max()
    print(f"{name:26s} {r.ms:7.3f} ms  {r.gpix_s:6.2f} GPix/s  "
          f"err(540p vs oracle) {err_small:.2e}  err(4K vs shipped) "
          f"{err4k:.2e}", flush=True)
print("DONE", flush=True)
