"""Round-3 integral probe, part 2: V1 (fused hi/lo) band sweep + a
piecewise cost breakdown of the fused kernel at 4K.

Breakdown kernels are NOT exact (they skip work); they only bound where the
time goes: P0 copy only (u8 in -> i32 out), P1 + converts, P2 + row-scan
matmul + relayouts, P3 + hi/lo split, P4 full (= V1).

Run: python scripts/probes/integral_r3b_probe.py
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


def _v1_kernel(x_ref, o_ref, carry, *, stage):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, wp = o_ref.shape
    nt = wp // 128
    if stage == 0:  # copy only
        o_ref[:] = x_ref[:].astype(jnp.int32)
        return
    x32 = x_ref[:].astype(jnp.int32)
    x = x32.astype(jnp.float32).reshape(rows * nt, 128)
    if stage == 1:  # + converts (reshape view of converts only)
        o_ref[:] = x.reshape(rows, wp).astype(jnp.int32)
        return
    U = jnp.transpose(_tri(128, strict=False, dtype=jnp.float32))
    intile = jax.lax.dot_general(
        x, U, _ARGS, preferred_element_type=jnp.float32
    ).reshape(rows, nt, 128)
    f = intile.reshape(rows, wp)
    if stage == 2:  # + row scan + relayouts
        o_ref[:] = f.astype(jnp.int32)
        return
    hi = jnp.floor(f * (1.0 / 256.0))
    lo = f - hi * 256.0
    if stage == 3:  # + split (no column matmuls)
        o_ref[:] = (hi * 256.0 + lo).astype(jnp.int32)
        return
    totals = intile[:, :, 127]
    tc = jax.lax.dot_general(
        totals, _tri(nt, strict=True, dtype=jnp.float32), _ARGS,
        precision=_HI, preferred_element_type=jnp.float32,
    )
    L = _tri(rows, strict=False, dtype=jnp.float32)
    W2 = jnp.concatenate([L * 256.0, L], axis=1)
    hl = jnp.concatenate([hi, lo], axis=0)
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
    s = (s2d.reshape(rows, nt, 128).astype(jnp.int32) + tc2d[:, :, None])
    s = s.reshape(rows, wp) + carry[:]
    o_ref[:] = s
    carry[:] = s[rows - 1:, :]


def make(band, stage):
    body = functools.partial(_v1_kernel, stage=stage)

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

    print("-- band sweep (full fused kernel) --")
    for band in (32, 48, 64, 96, 120):
        try:
            fn = make(band, stage=4)
            got = np.asarray(fn(x))
            exact = bool((got == ref).all())
            r = time_stream_fn(fn, x, name=f"band{band}")
            print(f"V1 band{band}: {r.ms:.4f} ms  exact={exact}"
                  f"  ({2160*3840/r.ms/1e6:.1f} GPix/s)")
        except Exception as e:
            print(f"V1 band{band}: FAILED {str(e).splitlines()[0][:200]}")

    print("-- stage breakdown at band 48 --")
    for stage, label in [(0, "copy"), (1, "+converts"), (2, "+rowscan"),
                         (3, "+split"), (4, "full")]:
        try:
            fn = make(48, stage)
            np.asarray(fn(x))
            r = time_stream_fn(fn, x, name=f"stage{stage}")
            print(f"P{stage} {label}: {r.ms:.4f} ms")
        except Exception as e:
            print(f"P{stage} {label}: FAILED {str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
