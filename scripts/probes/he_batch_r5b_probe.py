"""Round-5 probe B: batched-HE hist stage — isolate WHERE the 31.6-vs-40
GPix/s loss lives (VERDICT r4 item 4, follow-up to he_batch_r5_probe).

Hypotheses from probe A (k-split ladder was flat-to-worse):
  (1) the inner-dim jnp.pad of (16, 2073600) -> (16, pp) is a strided
      33-MB relayout the single-frame path never pays (its pad is an
      outer-row append);
  (2) per-frame ROW-BAND grouping — pad each frame's rows to a sublane
      multiple (cheap, frame-contiguous) and feed (B*nb, 32, W) blocks,
      the exact single-frame regime — recovers the single-frame rate.
Plus reference rates: one 1080p frame alone, and the whole batch counted
as ONE global domain (wrong semantics, pure compute-rate ceiling).
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

print(f"devices: {jax.devices()}", flush=True)
key = jax.random.PRNGKey(3)
img4k = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(
    jnp.uint8)
b16 = jnp.stack([jnp.roll(img4k[:1080, :1920], i, axis=1) for i in range(16)])
PIXB = 16 * 1080 * 1920
PIX1 = 1080 * 1920


def timed(name, fn, x, pix, sol_bytes, iters=16):
    r = time_stream_fn(fn, x, iters=iters, name=name, pixels=pix,
                       sol_ms=sol_ms(sol_bytes))
    print(f"{name:28s} {r.ms:7.3f} ms  {r.gpix_s:6.2f} GPix/s  "
          f"(alt {r.ms_alt:7.3f})", flush=True)
    return r.ms


@jax.jit
def hist_frames_rowband(b):
    """Per-frame hists via per-frame 32-row bands (B, H, W) -> (B, 256)."""
    B, H, W = b.shape
    hp, wp = round_up(H, _ROWS), round_up(W, 128)
    x = jnp.pad(b, ((0, 0), (0, hp - H), (0, wp - W)))
    nb = hp // _ROWS
    hists = _run_groups(x.reshape(B * nb, _ROWS, wp))
    hists = jnp.sum(hists.reshape(B, nb, 256), axis=1)
    return hists.at[:, 0].add(H * W - hp * wp)


# exactness first (tiny, on-chip): rowband == flat-groups
ref = np.asarray(hist256_groups_pallas(b16.reshape(16, -1)))
got = np.asarray(hist_frames_rowband(b16))
assert (got == ref).all(), "rowband hist mismatch"
print("rowband exactness OK", flush=True)

flat = b16.reshape(16, -1)
p = flat.shape[1]
pp = round_up(p, _ROWS * 128)

timed("hist_flatgroups_b16(cur)", hist256_groups_pallas, flat, PIXB, PIXB)
timed("hist_rowband_b16", hist_frames_rowband, b16, PIXB, PIXB)
timed("pad_inner_b16_only",
      jax.jit(lambda x: jnp.pad(x, ((0, 0), (0, pp - p)))), flat,
      PIXB, 2 * PIXB)
timed("pad_rows_b16_only",
      jax.jit(lambda x: jnp.pad(x, ((0, 0), (0, round_up(1080, _ROWS)
                                              - 1080), (0, 0)))), b16,
      PIXB, 2 * PIXB)
timed("hist_1080p_single", hist256_pallas, b16[0], PIX1, PIX1)
timed("hist_globaldomain_b16",
      jax.jit(lambda x: hist256_pallas(x.reshape(16 * 1080, 1920))), b16,
      PIXB, PIXB)
print("DONE", flush=True)
