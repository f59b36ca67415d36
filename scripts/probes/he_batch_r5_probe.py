"""Round-5 probe: where does batched HE lose 28% vs single-frame?
(VERDICT r4 item 4: hist_equalize_1080p_b16 = 23.2 GPix/s vs 32.3 single.)

Stage split on chip: per-frame hist kernel alone, frames-grid LUT kernel
alone, full op; plus subgroup-split variants of the hist kernel (smaller
lane extents per grid step) to see whether the 2-MPix-per-step contraction
is the cost.
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
from tpuimg.core.layout import round_up
from tpuimg.core.timing import sol_ms, time_stream_fn
from tpuimg.kernels.hist import (_MAX_GROUP, _ROWS, _run_groups,
                                 hist256_groups_pallas, hist256_pallas)
from tpuimg.kernels.lut import lut_gather, lut_gather_frames

print(f"devices: {jax.devices()}", flush=True)
key = jax.random.PRNGKey(3)
img4k = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(
    jnp.uint8)
b16 = jnp.stack([jnp.roll(img4k[:1080, :1920], i, axis=1) for i in range(16)])
PIXB = 16 * 1080 * 1920
PIX4K = 2160 * 3840


def timed(name, fn, x, pix, sol_bytes, iters=16):
    r = time_stream_fn(fn, x, iters=iters, name=name, pixels=pix,
                       sol_ms=sol_ms(sol_bytes))
    print(f"{name:28s} {r.ms:7.3f} ms  {r.gpix_s:6.2f} GPix/s  "
          f"(alt {r.ms_alt:7.3f})", flush=True)
    return r.ms


def hist_groups_split(x2, k):
    """hist256_groups_pallas with a FORCED k-way subgroup split."""
    g, p = x2.shape
    pp = round_up(p, k * _ROWS * 128)
    xq = jnp.pad(x2, ((0, 0), (0, pp - p)))
    hists = _run_groups(xq.reshape(g * k, _ROWS, pp // k // _ROWS))
    hists = jnp.sum(hists.reshape(g, k, 256), axis=1)
    return hists.at[:, 0].add(p - pp)


flat = b16.reshape(16, -1)
# full op, then stages
timed("he_b16_full", lambda x: tpuimg.hist_equalize(x, impl="pallas"), b16,
      PIXB, 3 * PIXB)
timed("he_4k_single_full", lambda x: tpuimg.hist_equalize(x, impl="pallas"),
      img4k, PIX4K, 3 * PIX4K)
timed("hist_groups_b16(k=1)", hist256_groups_pallas, flat, PIXB, PIXB)
for k in (2, 4, 8, 16):
    timed(f"hist_groups_b16(k={k})",
          lambda x, k=k: hist_groups_split(x, k), flat, PIXB, PIXB)
timed("hist_4k_single", hist256_pallas, img4k, PIX4K, PIX4K)

tables = jnp.tile(jnp.arange(256, dtype=jnp.uint8)[None], (16, 1))
timed("lut_frames_b16", lambda x: lut_gather_frames(tables, x), b16, PIXB,
      2 * PIXB)
timed("lut_4k_single", lambda x: lut_gather(tables[0], x), img4k, PIX4K,
      2 * PIX4K)
print("DONE", flush=True)
