"""Round-3 integral probe, part 7: kill the tiny HIGHEST matmuls.

Hypothesis: V7's residue over the copy floor is serial latency of the
per-band carry chain — 3 tiny HIGHEST (6-pass) matmuls whose results gate
the band store. The carry arrays are tiny ((band, nt) ~ 48x30) and all
values < 2^21, so plain i32 VPU cumsums are exact with NO precision dance.

  G0  V7 control (fused hi/lo col matmul + repeat broadcast)
  G1  V7 with ALL tiny carry matmuls replaced by jnp.cumsum in i32:
      tc_exc = cumsum(totals,1) - totals ; tc2d = cumsum(tc_exc,0)
  G2  G1 + reshape the u8 block BEFORE the i32/f32 converts (tile-major
      relayout moves 1 byte/px instead of 4)
  G3  G2 with f32 cumsums (is i32 vs f32 VPU add speed a factor?)

Run: python scripts/probes/integral_r3g_probe.py
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


def _kernel(x_ref, o_ref, carry, *, carries, u8_reshape):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, wp = o_ref.shape
    nt = wp // 128
    if u8_reshape:
        x = (x_ref[:].reshape(rows * nt, 128).astype(jnp.int32)
             .astype(jnp.float32))
    else:
        x = (x_ref[:].astype(jnp.int32).astype(jnp.float32)
             .reshape(rows * nt, 128))
    U = jnp.transpose(_tri(128, strict=False, dtype=jnp.float32))
    intile = jax.lax.dot_general(
        x, U, _ARGS, preferred_element_type=jnp.float32
    ).reshape(rows, nt, 128)
    totals = intile[:, :, 127]
    f = intile.reshape(rows, wp)
    hi = jnp.floor(f * (1.0 / 256.0))
    lo = f - hi * 256.0
    L = _tri(rows, strict=False, dtype=jnp.float32)
    W2 = jnp.concatenate([L * 256.0, L], axis=1)
    hl = jnp.concatenate([hi, lo], axis=0)
    s2d = jax.lax.dot_general(W2, hl, _ARGS,
                              preferred_element_type=jnp.float32)

    if carries == "matmul":
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
        tc2d = (sth.astype(jnp.int32) << 12) + stl.astype(jnp.int32)
    elif carries == "cumsum_i32":
        t32 = totals.astype(jnp.int32)
        tc_exc = jnp.cumsum(t32, axis=1) - t32
        tc2d = jnp.cumsum(tc_exc, axis=0)
    else:  # cumsum_f32 (values < 2^21 + band*2^21 < 2^24: exact)
        tc_exc = jnp.cumsum(totals, axis=1) - totals
        tc2d = jnp.cumsum(tc_exc, axis=0).astype(jnp.int32)

    tcw = jnp.repeat(tc2d, 128, axis=1)
    s = s2d.astype(jnp.int32) + tcw + carry[:]
    o_ref[:] = s
    carry[:] = s[rows - 1:, :]


def make(carries="matmul", u8_reshape=False, band=48):
    body = functools.partial(_kernel, carries=carries, u8_reshape=u8_reshape)

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
    cases = [
        ("G0_v7", dict()),
        ("G1_cumsum_i32", dict(carries="cumsum_i32")),
        ("G2_u8reshape", dict(carries="cumsum_i32", u8_reshape=True)),
        ("G3_cumsum_f32", dict(carries="cumsum_f32", u8_reshape=True)),
    ]
    for name, kw in cases:
        try:
            fn = make(**kw)
            got = np.asarray(fn(x))
            exact = bool((got == ref).all())
            times = [time_stream_fn(fn, x, name=name).ms for _ in range(3)]
            best = min(times)
            print(f"{name}: {best:.4f} ms (3 reps: "
                  f"{', '.join(f'{t:.4f}' for t in times)}) exact={exact}"
                  f"  ({2160*3840/best/1e6:.1f} GPix/s)")
        except Exception as e:
            print(f"{name}: FAILED {str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
