"""Round-2 integral kernel probe: where do the 0.25 ms go?

Variants: current kernel; row-scan only; column-scan only; 3D dot_general
(no lane->sublane reshape); bigger band. Honest streaming timing.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import functools

import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tpuimg
from tpuimg.core.layout import pad_to_multiple
from tpuimg.core.timing import time_stream_fn
from tpuimg.kernels import interpret_mode
from tpuimg.kernels.scan2d import _scan_shift, _SEG

key = jax.random.PRNGKey(0)
img = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = 2160 * 3840


def make_variant(band, do_rows, do_cols, reshape3d):
    def kernel(x_ref, o_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        rows, wp = o_ref.shape
        nt = wp // 128
        if do_rows:
            ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            U = (ii <= jj).astype(jnp.float32)
            if reshape3d:
                x3 = x_ref[:].astype(jnp.int32).astype(jnp.float32).reshape(rows, nt, 128)
                intile = jax.lax.dot_general(
                    x3, U, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (rows, nt, 128)
                totals = intile[:, :, 127]
            else:
                x = x_ref[:].astype(jnp.int32).astype(jnp.float32).reshape(rows * nt, 128)
                intile = jax.lax.dot_general(
                    x, U, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(rows, nt, 128)
                totals = intile[:, :, 127]
            a = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 0)
            b = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 1)
            L = (a < b).astype(jnp.float32)
            tc = jax.lax.dot_general(
                totals, L, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            r = ((intile + tc[:, :, None]).reshape(rows, wp)).astype(jnp.int32)
        else:
            r = x_ref[:].astype(jnp.int32)
        if do_cols:
            idx = jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
            for shift in (1, 2, 4):
                rolled = pltpu.roll(r, shift, axis=0)
                r = r + jnp.where(idx % _SEG >= shift, rolled, 0)
            nseg = rows // _SEG
            seg_tot = r.reshape(nseg, _SEG, wp)[:, _SEG - 1]
            seg_carry = _scan_shift(seg_tot, axis=0) - seg_tot
            expanded = jnp.broadcast_to(
                seg_carry[:, None, :], (nseg, _SEG, wp)).reshape(rows, wp)
            s = r + expanded + carry[:]
            o_ref[:] = s
            carry[:] = s[rows - 1:, :]
        else:
            o_ref[:] = r

    @jax.jit
    def run(im):
        x, (h, w) = pad_to_multiple(im, 32, 128, mode="constant")
        x, _ = pad_to_multiple(x, band, 128, mode="constant")
        hp, wp = x.shape
        out = pl.pallas_call(
            kernel,
            grid=(hp // band,),
            in_specs=[pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, wp), jnp.int32)],
            interpret=interpret_mode(),
        )(x)
        return out[:h, :w]

    return run


cases = [
    ("current(b128)", make_variant(128, True, True, False)),
    ("rows-only", make_variant(128, True, False, False)),
    ("cols-only", make_variant(128, False, True, False)),
    ("3d-dot(b128)", make_variant(128, True, True, True)),
    ("3d-dot(b256)", make_variant(256, True, True, True)),
    ("current(b256)", make_variant(256, True, True, False)),
    ("copy-only", make_variant(128, False, False, False)),
]
for name, fn in cases:
    try:
        r = time_stream_fn(fn, img, iters=32, pixels=PIX)
        print(f"{name:16s} {r.ms:8.4f} ms {r.gpix_s:8.2f} GPix/s", flush=True)
    except Exception as e:
        print(f"{name:16s} ERROR {str(e)[:200]}", flush=True)

# correctness of the 3d variant
ref = tpuimg.integral(img, impl="xla")
got = make_variant(256, True, True, True)(img)
print("3d-dot(b256) exact:", bool((got == ref).all()))
