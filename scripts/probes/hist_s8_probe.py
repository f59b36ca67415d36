"""Round-4 probe: can the hist front-end beat its round-3 'floor'?

The 4K global-hist kernel measured 0.203-0.207 ms, matching a 2x16
f32-rate compare-row op model (round 3 closed the f32 ladder). Untried
axes, probed here on the real chip:

  v0  shipped kernel (i32 compares -> bf16 one-hots -> bf16 MXU dot)
  v1  i32 compares -> int8 one-hots -> s8xs8->i32 MXU dot
      (tests whether the s8 MXU path + skipping the bf16 converts helps)
  v2  u8-native compares (u8 operands end to end) -> int8 -> s8 dot
      (tests whether Mosaic runs 8-bit compares at packed rate)

Also: the CLAHE tile regroup. XLA's u8 transpose of (8,270,8,480) costs
~0.15 ms at 4K; a Pallas kernel with static misaligned lane slices writing
(G, thp, twp) zero-padded tile blocks should approach copy bandwidth.

Run: python scripts/probes/hist_s8_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.layout import round_up
from tpuimg.core.timing import time_stream_fn

ROWS = 32


def make_hist(variant):
    def kernel(x_ref, o_ref):
        x = x_ref[0]  # (32, W) u8
        rows, w = x.shape
        n = rows * w
        if variant == "v2":
            hi = (x >> 4).reshape(1, n)          # u8 planes
            lo = (x & 15).reshape(1, n)
            bins = jax.lax.broadcasted_iota(jnp.uint8, (16, 1), 0)
        else:
            xi = x.astype(jnp.int32)
            hi = (xi >> 4).reshape(1, n)
            lo = (xi & 15).reshape(1, n)
            bins = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        oh_dtype = jnp.bfloat16 if variant == "v0" else jnp.int8
        ohh = (jnp.broadcast_to(hi, (16, n)) == bins).astype(oh_dtype)
        ohl = (jnp.broadcast_to(lo, (16, n)) == bins).astype(oh_dtype)
        part = jax.lax.dot_general(
            ohh, ohl, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32 if variant == "v0"
            else jnp.int32,
        )
        o_ref[0] = jnp.concatenate(
            [part.astype(jnp.int32),
             jnp.zeros((16, 112), jnp.int32)], axis=1)

    @jax.jit
    def hist(img):
        h, w = img.shape
        xg = img.reshape(h // ROWS, ROWS, w)
        g = xg.shape[0]
        out = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, ROWS, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, 16, 128), jnp.int32),
        )(xg)
        return jnp.sum(out[:, :, :16].reshape(g, 256), axis=0)

    return hist


def pallas_regroup(ext, ytiles, xtiles, th, tw):
    """(Y*th, X*tw) u8 -> (Y*X, thp, twp) zero-padded tile blocks via static
    misaligned lane slices; one grid step per ytile row-band."""
    thp, twp = round_up(th, ROWS), round_up(tw, 128)
    wp = round_up(xtiles * tw, 128)
    ext = jnp.pad(ext, ((0, 0), (0, wp - xtiles * tw)))

    def kernel(x_ref, o_ref):
        for j in range(xtiles):
            tile = x_ref[:, j * tw : j * tw + tw]  # static misaligned slice
            tile = jnp.pad(tile, ((0, thp - th), (0, twp - tw)))
            o_ref[j] = tile

    out = pl.pallas_call(
        kernel,
        grid=(ytiles,),
        in_specs=[pl.BlockSpec((th, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((xtiles, thp, twp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ytiles * xtiles, thp, twp),
                                       jnp.uint8),
    )(ext)
    return out


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    img_np = rng.integers(0, 256, (2176, 3840), dtype=np.uint8)  # 32-mult rows
    img = jnp.asarray(img_np)
    ref = np.bincount(img_np.ravel(), minlength=256)

    for v in ("v0", "v1", "v2"):
        try:
            fn = make_hist(v)
            got = np.asarray(fn(img))
            ok = (got == ref).all()
            r = time_stream_fn(fn, img, iters=32, name=v)
            print(f"hist {v:3s}  {r.ms:.4f} ms (alt {r.ms_alt:.4f}) "
                  f"exact={bool(ok)}", flush=True)
        except Exception as e:
            print(f"hist {v:3s}  FAILED: {str(e)[:200]}", flush=True)

    # --- regroup probe (4K 8x8: th=270, tw=480) ---
    ext = jnp.asarray(rng.integers(0, 256, (2160, 3840), dtype=np.uint8))
    th, tw = 270, 480

    def xla_regroup(v):
        return v.reshape(8, th, 8, tw).transpose(0, 2, 1, 3).reshape(
            64, th * tw)

    r = time_stream_fn(jax.jit(xla_regroup), ext, iters=32, name="xla")
    print(f"regroup xla u8      {r.ms:.4f} ms (alt {r.ms_alt:.4f})",
          flush=True)

    try:
        f = jax.jit(lambda v: pallas_regroup(v, 8, 8, th, tw))
        got = np.asarray(f(ext))
        want = np.asarray(xla_regroup(ext)).reshape(64, th, tw)
        ok = (got[:, :th, :tw] == want).all() and (
            got[:, th:, :].max(initial=0) == 0)
        r = time_stream_fn(f, ext, iters=32, name="pallas")
        print(f"regroup pallas      {r.ms:.4f} ms (alt {r.ms_alt:.4f}) "
              f"exact={bool(ok)}", flush=True)
    except Exception as e:
        print(f"regroup pallas FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
