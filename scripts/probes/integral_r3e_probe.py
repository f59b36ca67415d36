"""Round-3 integral probe, part 5: attribute the Q1->Q2 80us between the
tiny HIGHEST matmuls and the 3D-reshape broadcast add.

  V6  all-DEFAULT tiny matmuls (digit-split totals before the strict scan,
      base-256 digits of tc before the L scans); broadcast add via reshape
      (as V1)
  V7  V1's HIGHEST tinies, broadcast add via jnp.repeat (no 3D reshape)
  V8  V6 + repeat broadcast (both fixes)

Run: python scripts/probes/integral_r3e_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.layout import pad_to_multiple
from tpuimg.core.timing import time_stream_fn
from tpuimg.kernels.scan2d import _tri

_HI = jax.lax.Precision.HIGHEST
_ARGS = (((1,), (0,)), ((), ()))


def _kernel(x_ref, o_ref, carry, *, default_tinies, repeat_bcast):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, wp = o_ref.shape
    nt = wp // 128
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32).reshape(rows * nt, 128)
    U = jnp.transpose(_tri(128, strict=False, dtype=jnp.float32))
    intile2 = jax.lax.dot_general(
        x, U, _ARGS, preferred_element_type=jnp.float32)
    intile = intile2.reshape(rows, nt, 128)
    f = intile.reshape(rows, wp)
    totals = intile[:, :, 127]  # (rows, nt), <= 32640
    T = _tri(nt, strict=True, dtype=jnp.float32)
    L = _tri(rows, strict=False, dtype=jnp.float32)

    if default_tinies:
        hi_t = jnp.floor(totals * (1.0 / 256.0))  # <= 127 bf16-exact
        lo_t = totals - hi_t * 256.0              # <= 255
        tcH = jax.lax.dot_general(hi_t, T, _ARGS,
                                  preferred_element_type=jnp.float32)
        tcL = jax.lax.dot_general(lo_t, T, _ARGS,
                                  preferred_element_type=jnp.float32)
        tc = tcH * 256.0 + tcL                    # < 2^20 exact
        t2 = jnp.floor(tc * (1.0 / 65536.0))
        r2 = tc - t2 * 65536.0
        t1 = jnp.floor(r2 * (1.0 / 256.0))
        t0 = r2 - t1 * 256.0
        st2 = jax.lax.dot_general(L, t2, _ARGS,
                                  preferred_element_type=jnp.float32)
        st1 = jax.lax.dot_general(L, t1, _ARGS,
                                  preferred_element_type=jnp.float32)
        st0 = jax.lax.dot_general(L, t0, _ARGS,
                                  preferred_element_type=jnp.float32)
        tc2d = ((st2.astype(jnp.int32) << 16) + (st1.astype(jnp.int32) << 8)
                + st0.astype(jnp.int32))
    else:
        tc = jax.lax.dot_general(totals, T, _ARGS, precision=_HI,
                                 preferred_element_type=jnp.float32)
        th = jnp.floor(tc * (1.0 / 4096.0))
        tl = tc - th * 4096.0
        hi_prec = None if wp <= 4096 else _HI
        sth = jax.lax.dot_general(L, th, _ARGS, precision=hi_prec,
                                  preferred_element_type=jnp.float32)
        stl = jax.lax.dot_general(L, tl, _ARGS, precision=_HI,
                                  preferred_element_type=jnp.float32)
        tc2d = (sth.astype(jnp.int32) << 12) + stl.astype(jnp.int32)

    hi = jnp.floor(f * (1.0 / 256.0))
    lo = f - hi * 256.0
    W2 = jnp.concatenate([L * 256.0, L], axis=1)
    hl = jnp.concatenate([hi, lo], axis=0)
    s2d = jax.lax.dot_general(W2, hl, _ARGS,
                              preferred_element_type=jnp.float32)

    if repeat_bcast:
        tcw = jnp.repeat(tc2d, 128, axis=1)  # (rows, wp) lane-expansion
        s = s2d.astype(jnp.int32) + tcw + carry[:]
    else:
        s = (s2d.reshape(rows, nt, 128).astype(jnp.int32)
             + tc2d[:, :, None]).reshape(rows, wp) + carry[:]
    o_ref[:] = s
    carry[:] = s[rows - 1:, :]


def make(default_tinies, repeat_bcast, band=48):
    body = functools.partial(_kernel, default_tinies=default_tinies,
                             repeat_bcast=repeat_bcast)

    @jax.jit
    def run(img):
        x, (h, w) = pad_to_multiple(jnp.asarray(img), band, 128,
                                    mode="constant")
        hp, wp = x.shape
        b = min(band, hp)
        out = pl.pallas_call(
            body,
            grid=(hp // b,),
            in_specs=[pl.BlockSpec((b, wp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((b, wp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, wp), jnp.int32)],
        )(x)
        return out[:h, :w]

    return run


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2160, 3840), dtype=np.uint8)
    ref = np.cumsum(np.cumsum(img.astype(np.int64), 0), 1).astype(np.int32)
    x = jnp.asarray(img)
    for name, kw in [("V6_default_tinies", dict(default_tinies=True,
                                                repeat_bcast=False)),
                     ("V7_repeat_bcast", dict(default_tinies=False,
                                              repeat_bcast=True)),
                     ("V8_both", dict(default_tinies=True,
                                      repeat_bcast=True))]:
        try:
            fn = make(**kw)
            got = np.asarray(fn(x))
            exact = bool((got == ref).all())
            r = time_stream_fn(fn, x, name=name)
            print(f"{name}: {r.ms:.4f} ms  exact={exact}"
                  f"  ({2160*3840/r.ms/1e6:.1f} GPix/s)")
        except Exception as e:
            print(f"{name}: FAILED {str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
