"""Probe: packed / narrow-lane compare variants for the histogram kernel.

VERDICT round-2 weak #2: hist_equalize sits at 0.252 ms vs a 0.030 ms HBM
floor; the op-count model says the 2x16 broadcast-compare rows per pixel
(~0.21 ms of i32 VPU work) dominate. Untried lever: run the compares on
narrower lanes (2 u8 per i16 lane / 4 per i32 with masked compares) so each
VPU op covers more pixels. This probe measures kernel-only time at 4K for:

  A  current form: i32 compares -> bf16 one-hot -> MXU        (baseline)
  B  bf16 compares: pixels+bins in bf16, compare directly      (packed 16-bit
     vregs if Mosaic emits them)
  C  i16 compares: same, int16                                  (packed i16)
  D  masked packed-i32: 2 pixels per i32 lane, compare each
     half against (bin | bin<<16) via xor+mask (VERDICT's literal ask)

Run on the real chip: python scripts/probes/hist_packed_probe.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tpuimg.core.layout import round_up
from tpuimg.core.timing import time_stream_fn

_ROWS = 32


def _body_A(x_ref, o_ref):
    x = x_ref[0].astype(jnp.int32)
    rows, w = x.shape
    n = rows * w
    hi = (x >> 4).reshape(1, n)
    lo = (x & 15).reshape(1, n)
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    ohh = (jnp.broadcast_to(hi, (16, n)) == bins).astype(jnp.bfloat16)
    ohl = (jnp.broadcast_to(lo, (16, n)) == bins).astype(jnp.bfloat16)
    part = jax.lax.dot_general(ohh, ohl, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[0] = jnp.concatenate(
        [part, jnp.zeros((16, 112), jnp.float32)], axis=1).astype(jnp.int32)


def _body_B(x_ref, o_ref):
    x = x_ref[0].astype(jnp.int32)
    rows, w = x.shape
    n = rows * w
    hi = (x >> 4).reshape(1, n).astype(jnp.bfloat16)
    lo = (x & 15).reshape(1, n).astype(jnp.bfloat16)
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0).astype(jnp.bfloat16)
    ohh = (jnp.broadcast_to(hi, (16, n)) == bins).astype(jnp.bfloat16)
    ohl = (jnp.broadcast_to(lo, (16, n)) == bins).astype(jnp.bfloat16)
    part = jax.lax.dot_general(ohh, ohl, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[0] = jnp.concatenate(
        [part, jnp.zeros((16, 112), jnp.float32)], axis=1).astype(jnp.int32)


def _body_C(x_ref, o_ref):
    x = x_ref[0].astype(jnp.int16)
    rows, w = x.shape
    n = rows * w
    hi = (x >> 4).reshape(1, n)
    lo = (x & 15).reshape(1, n)
    bins = jax.lax.broadcasted_iota(jnp.int16, (16, 1), 0)
    ohh = (jnp.broadcast_to(hi, (16, n)) == bins).astype(jnp.bfloat16)
    ohl = (jnp.broadcast_to(lo, (16, n)) == bins).astype(jnp.bfloat16)
    part = jax.lax.dot_general(ohh, ohl, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[0] = jnp.concatenate(
        [part, jnp.zeros((16, 112), jnp.float32)], axis=1).astype(jnp.int32)


def _body_D(x_ref, o_ref):
    # 2 pixels per i32 lane: even pixels in low 16 bits, odd in high.
    x = x_ref[0].astype(jnp.int32)
    rows, w = x.shape
    n2 = rows * w // 2
    xf = x.reshape(rows, w // 2, 2)
    packed = (xf[:, :, 0] | (xf[:, :, 1] << 16)).reshape(1, n2)
    hi = (packed >> 4) & 0x000F000F
    lo = packed & 0x000F000F
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    bins2 = bins | (bins << 16)
    hb = jnp.broadcast_to(hi, (16, n2))
    lb = jnp.broadcast_to(lo, (16, n2))
    # half-equality: (v ^ b2) has a zero 16-bit half iff that half matches.
    hx = hb ^ bins2
    lx = lb ^ bins2
    ohh_lo = ((hx & 0xFFFF) == 0).astype(jnp.bfloat16)
    ohh_hi = ((hx >> 16) == 0).astype(jnp.bfloat16)
    ohl_lo = ((lx & 0xFFFF) == 0).astype(jnp.bfloat16)
    ohl_hi = ((lx >> 16) == 0).astype(jnp.bfloat16)
    part = jax.lax.dot_general(ohh_lo, ohl_lo, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    part += jax.lax.dot_general(ohh_hi, ohl_hi, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    o_ref[0] = jnp.concatenate(
        [part, jnp.zeros((16, 112), jnp.float32)], axis=1).astype(jnp.int32)


def make(body):
    @jax.jit
    def run(img):
        h, w = img.shape
        hp, wp = round_up(h, _ROWS), round_up(w, 128)
        x = jnp.pad(img, ((0, hp - h), (0, wp - w)))
        xg = x.reshape(hp // _ROWS, _ROWS, wp)
        g, rows, wg = xg.shape
        out = pl.pallas_call(
            body,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, rows, wg), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, 16, 128), jnp.int32),
        )(xg)
        hist = jnp.sum(out[:, :, :16].reshape(g, 256), axis=0)
        return hist.at[0].add(h * w - hp * wp)

    return run


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2160, 3840), dtype=np.uint8)
    ref = np.bincount(img.ravel(), minlength=256)
    x = jnp.asarray(img)
    import os
    only = os.environ.get("ONLY")
    allv = [("A_i32", _body_A), ("B_bf16", _body_B),
            ("C_i16", _body_C), ("D_packed", _body_D)]
    for name, body in [v for v in allv if not only or v[0].startswith(only)]:
        try:
            fn = make(body)
            got = np.asarray(fn(x))
            exact = bool((got == ref).all())
            r = time_stream_fn(fn, x, name=name)
            print(f"{name}: {r.ms:.4f} ms  exact={exact}")
        except Exception as e:
            msg = str(e).split("\n")[0][:300]
            print(f"{name}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
