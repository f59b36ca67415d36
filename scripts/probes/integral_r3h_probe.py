"""Round-3 integral probe, part 8: carry chain without cumsum primitive.

jnp.cumsum does not lower in Pallas TPU (r3g: "Unimplemented primitive
... cumsum").  Replace the tiny HIGHEST carry matmuls with explicit
log-depth shift-add scans (pure VPU concatenate+add, exact in f32 for
values < 2^24), and probe the u8-first reshape separately.

  H0  V7 control (HIGHEST tiny matmuls + repeat broadcast), band 48
  H1  V7 with both tiny scans replaced by log-depth shift-add cumsums
  H2  H1 + reshape the u8 block BEFORE the converts (1 byte/px relayout)
  H3  V7 + u8-first reshape (matmul carries, isolates the reshape effect)
  H4  fold the carry broadcast INTO the big row-scan matmul: digit-split
      tc_exc into base-256 digits, repeat to lanes, extend W2 to
      [65536L, 256L, L] over [hi, lo, d2, d1, d0] - one DEFAULT matmul
      does in-band scan + tile-carry broadcast, no HIGHEST L-scans.

Run: python scripts/probes/integral_r3h_probe.py
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


def _shift_cumsum(x, axis):
    """Inclusive cumsum by log-depth shift-adds (exact f32 < 2^24)."""
    n = x.shape[axis]
    d = 1
    while d < n:
        if axis == 1:
            z = jnp.zeros((x.shape[0], d), x.dtype)
            x = x + jnp.concatenate([z, x[:, :-d]], axis=1)
        else:
            z = jnp.zeros((d, x.shape[1]), x.dtype)
            x = x + jnp.concatenate([z, x[:-d, :]], axis=0)
        d *= 2
    return x


def _roll_cumsum(x, axis):
    """Inclusive cumsum via pltpu.roll + iota mask (no concatenate)."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, axis)
        x = x + jnp.where(idx >= d, shifted, 0.0)
        d *= 2
    return x


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

    if carries == "fused":
        tc_exc = _shift_cumsum(totals, axis=1) - totals  # < 2^20, exact
        d2 = jnp.floor(tc_exc * (1.0 / 65536.0))
        r2 = tc_exc - d2 * 65536.0
        d1 = jnp.floor(r2 * (1.0 / 256.0))
        d0 = r2 - d1 * 256.0
        digits = [jnp.repeat(d, 128, axis=1) for d in (d2, d1, d0)]
        W5 = jnp.concatenate(
            [L * 256.0, L, L * 65536.0, L * 256.0, L], axis=1)
        hl = jnp.concatenate([hi, lo] + digits, axis=0)
        s2d = jax.lax.dot_general(W5, hl, _ARGS,
                                  preferred_element_type=jnp.float32)
        s = s2d.astype(jnp.int32) + carry[:]
        o_ref[:] = s
        carry[:] = s[rows - 1:, :]
        return

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
    else:
        # shift-add scans; tc_exc < 2^20, column scan over <=48 rows
        # would exceed 2^24 -> digit-split before the column scan.
        scan = _shift_cumsum if carries == "shift" else _roll_cumsum
        tc_exc = scan(totals, axis=1) - totals
        th = jnp.floor(tc_exc * (1.0 / 4096.0))   # < 2^8
        tl = tc_exc - th * 4096.0                 # < 2^12
        sth = scan(th, axis=0)                    # < 48*2^8 < 2^14 exact
        stl = scan(tl, axis=0)                    # < 48*2^12 < 2^18 exact
        tc2d = (sth.astype(jnp.int32) << 12) + stl.astype(jnp.int32)

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
        ("H0_v7", dict()),
        ("H5_rollscan", dict(carries="roll")),
        ("H6_roll_band32", dict(carries="roll", band=32)),
        ("H7_roll_band64", dict(carries="roll", band=64)),
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
