"""Round-3 integral probe, part 4: kill the tile-carry broadcast-add.

Part-3 finding: the Q1->Q2 gap (tile-carry tiny matmuls + the 3D-reshape
broadcast add of tc2d) costs 0.080 ms of the 0.173 ms kernel — the 3D
(rows, nt, 128) <-> (rows, wp) reshapes around the add are relayouts.

V5 replaces it with MXU width-expansion: digit-split the cross-tile row
carry tc < 2^20 into base-256 digits t2 <= 15, t1, t0 <= 255 (bf16-exact),
expand each to full width with a 0/1 expander matmul E[(nt, wp)], and fold
the t1/t0 streams into the main column matmul:

  s_all = [256L | L | 256L | L] @ [hi; lo; t1w; t0w]   (partials < 2^23, exact)
  st2w  = L @ (t2 @ E)                                  (<= 720, exact)
  out   = i32(s_all) + i32(st2w) << 16 + carry          (flat adds, no reshapes)

V5b additionally derives tile totals as x @ ones instead of the lane-127
slice of the scanned tiles (tests whether the strided slice costs anything).

Run: python scripts/probes/integral_r3d_probe.py
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


def _expander(nt, dtype):
    """E[t, x] = 1 iff x // 128 == t  -> (nt, nt*128) 0/1 expansion."""
    t = jax.lax.broadcasted_iota(jnp.int32, (nt, nt * 128), 0)
    xcol = jax.lax.broadcasted_iota(jnp.int32, (nt, nt * 128), 1)
    return (xcol // 128 == t).astype(dtype)


def _v5_kernel(x_ref, o_ref, carry, *, totals_mm):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, wp = o_ref.shape
    nt = wp // 128
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32).reshape(rows * nt, 128)
    U = jnp.transpose(_tri(128, strict=False, dtype=jnp.float32))
    intile2 = jax.lax.dot_general(
        x, U, _ARGS, preferred_element_type=jnp.float32)  # (rows*nt, 128)
    f = intile2.reshape(rows, wp)
    if totals_mm:
        ones = jnp.ones((128, 128), jnp.float32)
        tot2 = jax.lax.dot_general(x, ones, _ARGS,
                                   preferred_element_type=jnp.float32)
        totals = tot2[:, :1].reshape(rows, nt)
    else:
        totals = intile2.reshape(rows, nt, 128)[:, :, 127]
    tc = jax.lax.dot_general(
        totals, _tri(nt, strict=True, dtype=jnp.float32), _ARGS,
        precision=_HI, preferred_element_type=jnp.float32,
    )  # (rows, nt), < wp*255 < 2^20 for wp <= 16K

    # base-256 digit split of tc (all digits bf16-exact operands)
    t2 = jnp.floor(tc * (1.0 / 65536.0))     # <= 15 at 4K
    r2 = tc - t2 * 65536.0
    t1 = jnp.floor(r2 * (1.0 / 256.0))       # <= 255
    t0 = r2 - t1 * 256.0                     # <= 255

    E = _expander(nt, jnp.float32)
    t1w = jax.lax.dot_general(t1, E, _ARGS, preferred_element_type=jnp.float32)
    t0w = jax.lax.dot_general(t0, E, _ARGS, preferred_element_type=jnp.float32)
    t2w = jax.lax.dot_general(t2, E, _ARGS, preferred_element_type=jnp.float32)

    hi = jnp.floor(f * (1.0 / 256.0))
    lo = f - hi * 256.0
    L = _tri(rows, strict=False, dtype=jnp.float32)
    W4 = jnp.concatenate([L * 256.0, L, L * 256.0, L], axis=1)
    hl = jnp.concatenate([hi, lo, t1w, t0w], axis=0)
    s_all = jax.lax.dot_general(W4, hl, _ARGS,
                                preferred_element_type=jnp.float32)
    st2w = jax.lax.dot_general(L, t2w, _ARGS,
                               preferred_element_type=jnp.float32)
    s = (s_all.astype(jnp.int32) + (st2w.astype(jnp.int32) << 16)
         + carry[:])
    o_ref[:] = s
    carry[:] = s[rows - 1:, :]


def make(totals_mm, band=48):
    body = functools.partial(_v5_kernel, totals_mm=totals_mm)

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
    for name, kw in [("V5_slice", dict(totals_mm=False)),
                     ("V5b_totmm", dict(totals_mm=True)),
                     ("V5_band32", dict(totals_mm=False, band=32)),
                     ("V5_band64", dict(totals_mm=False, band=64))]:
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
