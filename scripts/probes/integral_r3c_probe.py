"""Round-3 integral probe, part 3: sub-breakdown of the column section
(0.082 ms of the 0.17 ms fused kernel) + two alternatives.

Stages (band 48, on top of rowscan+split):
  Q0  split + hl concat only (no column matmul)
  Q1  + W2 @ hl matmul (s2d written, no tile-carry work)
  Q2  + tile-carry matmuls + broadcast add (no cross-band carry)
  Q3  full (= V1)
Alternatives:
  ALT_HIGHEST  no split/concat: s2d = L @ f at HIGHEST precision
  ALT_F32ADD   tile-carry add folded in f32 before the i32 convert

Run: python scripts/probes/integral_r3c_probe.py
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


def _kernel(x_ref, o_ref, carry, *, mode):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, wp = o_ref.shape
    nt = wp // 128
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32).reshape(rows * nt, 128)
    U = jnp.transpose(_tri(128, strict=False, dtype=jnp.float32))
    intile = jax.lax.dot_general(
        x, U, _ARGS, preferred_element_type=jnp.float32
    ).reshape(rows, nt, 128)
    f = intile.reshape(rows, wp)
    L = _tri(rows, strict=False, dtype=jnp.float32)

    if mode == "ALT_HIGHEST":
        s2d = jax.lax.dot_general(L, f, _ARGS, precision=_HI,
                                  preferred_element_type=jnp.float32)
    else:
        hi = jnp.floor(f * (1.0 / 256.0))
        lo = f - hi * 256.0
        W2 = jnp.concatenate([L * 256.0, L], axis=1)
        hl = jnp.concatenate([hi, lo], axis=0)
        if mode == "Q0":
            o_ref[:] = (hl[:rows] + hl[rows:]).astype(jnp.int32)
            return
        s2d = jax.lax.dot_general(W2, hl, _ARGS,
                                  preferred_element_type=jnp.float32)
    if mode == "Q1":
        o_ref[:] = s2d.astype(jnp.int32)
        return

    totals = intile[:, :, 127]
    tc = jax.lax.dot_general(
        totals, _tri(nt, strict=True, dtype=jnp.float32), _ARGS,
        precision=_HI, preferred_element_type=jnp.float32,
    )
    th = jnp.floor(tc * (1.0 / 4096.0))
    tl = tc - th * 4096.0
    hi_prec = None if wp <= 4096 else _HI
    sth = jax.lax.dot_general(L, th, _ARGS, precision=hi_prec,
                              preferred_element_type=jnp.float32)
    stl = jax.lax.dot_general(L, tl, _ARGS, precision=_HI,
                              preferred_element_type=jnp.float32)
    if mode == "ALT_F32ADD":
        # tc2d in f32: sth*4096 + stl < 2^23 and s2d < 2^22 -> sum < 2^24
        # stays f32-exact; one i32 convert after the fold
        tcf = sth * 4096.0 + stl
        s = (s2d.reshape(rows, nt, 128) + tcf[:, :, None]).reshape(
            rows, wp).astype(jnp.int32) + carry[:]
    else:
        tc2d = (sth.astype(jnp.int32) << 12) + stl.astype(jnp.int32)
        s = (s2d.reshape(rows, nt, 128).astype(jnp.int32)
             + tc2d[:, :, None]).reshape(rows, wp)
        if mode == "Q2":
            o_ref[:] = s
            return
        s = s + carry[:]
    o_ref[:] = s
    carry[:] = s[rows - 1:, :]


def make(mode, band=48):
    body = functools.partial(_kernel, mode=mode)

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
    for mode in ("Q0", "Q1", "Q2", "Q3", "ALT_HIGHEST", "ALT_F32ADD"):
        try:
            fn = make(mode)
            got = np.asarray(fn(x))
            exact = bool((got == ref).all())
            r = time_stream_fn(fn, x, name=mode)
            tag = f"exact={exact}" if mode in ("Q3", "ALT_HIGHEST",
                                               "ALT_F32ADD") else "(partial)"
            print(f"{mode}: {r.ms:.4f} ms  {tag}")
        except Exception as e:
            print(f"{mode}: FAILED {str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
