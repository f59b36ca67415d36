"""Round-3 integral probe, part 6: combine the V7 repeat-broadcast win
(0.148 ms, part 5) with the remaining convert/operand-width levers.

  F0  V7 re-measure (fused hi/lo column matmul + repeat broadcast)
  F1  F0 + direct u8->f32 convert (drop the i32 hop)
  F2  F0 + bf16 row-matmul operands (x, U explicit bf16; u8 < 2^8 exact)
  F3  F0 + bf16 column-matmul operands (hi,lo < 2^8 and W2 in {0,1,256}
      are bf16-exact; f32 accumulation keeps partials < 2^22 exact)
  F4  all three
  F4_b40 / F4_b56  band sweep around 48 on the best variant

Run: python scripts/probes/integral_r3f_probe.py
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


def _kernel(x_ref, o_ref, carry, *, direct_f32, bf16_row, bf16_col):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, wp = o_ref.shape
    nt = wp // 128
    rdt = jnp.bfloat16 if bf16_row else jnp.float32
    if direct_f32:
        x = x_ref[:].astype(rdt).reshape(rows * nt, 128)
    else:
        x = x_ref[:].astype(jnp.int32).astype(rdt).reshape(rows * nt, 128)
    U = jnp.transpose(_tri(128, strict=False, dtype=rdt))
    intile = jax.lax.dot_general(
        x, U, _ARGS, preferred_element_type=jnp.float32
    ).reshape(rows, nt, 128)
    totals = intile[:, :, 127]
    tc = jax.lax.dot_general(
        totals, _tri(nt, strict=True, dtype=jnp.float32), _ARGS,
        precision=_HI, preferred_element_type=jnp.float32,
    )
    f = intile.reshape(rows, wp)
    hi = jnp.floor(f * (1.0 / 256.0))
    lo = f - hi * 256.0
    cdt = jnp.bfloat16 if bf16_col else jnp.float32
    L = _tri(rows, strict=False, dtype=jnp.float32)
    W2 = jnp.concatenate([L * 256.0, L], axis=1).astype(cdt)
    hl = jnp.concatenate([hi, lo], axis=0).astype(cdt)
    s2d = jax.lax.dot_general(W2, hl, _ARGS,
                              preferred_element_type=jnp.float32)
    th = jnp.floor(tc * (1.0 / 4096.0))
    tl = tc - th * 4096.0
    hi_prec = None if wp <= 4096 else _HI
    sth = jax.lax.dot_general(L, th, _ARGS, precision=hi_prec,
                              preferred_element_type=jnp.float32)
    stl = jax.lax.dot_general(L, tl, _ARGS, precision=_HI,
                              preferred_element_type=jnp.float32)
    tc2d = (sth.astype(jnp.int32) << 12) + stl.astype(jnp.int32)
    tcw = jnp.repeat(tc2d, 128, axis=1)
    s = s2d.astype(jnp.int32) + tcw + carry[:]
    o_ref[:] = s
    carry[:] = s[rows - 1:, :]


def make(direct_f32=False, bf16_row=False, bf16_col=False, band=48):
    body = functools.partial(_kernel, direct_f32=direct_f32,
                             bf16_row=bf16_row, bf16_col=bf16_col)

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
        ("F0_v7", dict()),
        ("F1_direct", dict(direct_f32=True)),
        ("F2_bf16row", dict(bf16_row=True)),
        ("F3_bf16col", dict(bf16_col=True)),
        ("F4_all", dict(direct_f32=True, bf16_row=True, bf16_col=True)),
        ("F4_b40", dict(direct_f32=True, bf16_row=True, bf16_col=True,
                        band=40)),
        ("F4_b56", dict(direct_f32=True, bf16_row=True, bf16_col=True,
                        band=56)),
    ]
    for name, kw in cases:
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
