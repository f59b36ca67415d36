"""Round-3 integral probe, part 10: two independent carry chains per step.

Hypothesis: the fused kernel's residue over the copy floor is partly
serial-latency bubbles (each band's tiny carry matmuls gate its store, and
band i+1 depends on band i through the carry scratch). Splitting the frame
into TOP and BOTTOM halves scanned by INDEPENDENT chains inside the same
grid step gives Mosaic two interleavable instruction streams; the bottom
half is fixed up afterwards with + top_total (a (1, W) broadcast add that
runs at VMEM speed on the parked i32 output).

  J0  production kernel control (scan2d.integral_pallas)
  J1  two-chain kernel, band 48 per half (96 rows/step), XLA fix-up add
  J2  J1 at band 32 per half
  J3  J1 at band 64 per half

Run: python scripts/probes/integral_r3j_probe.py
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
from tpuimg.kernels.scan2d import _tri, integral_pallas

_HI = jax.lax.Precision.HIGHEST
_ARGS = (((1,), (0,)), ((), ()))


def _scan_band(x_u8, carry):
    """One band of the production V7 pipeline; returns (band_out, new_carry)."""
    rows, wp = x_u8.shape
    nt = wp // 128
    x = x_u8.astype(jnp.int32).astype(jnp.float32).reshape(rows * nt, 128)
    U = jnp.transpose(_tri(128, strict=False, dtype=jnp.float32))
    intile = jax.lax.dot_general(
        x, U, _ARGS, preferred_element_type=jnp.float32
    ).reshape(rows, nt, 128)
    totals = intile[:, :, 127]
    tc = jax.lax.dot_general(
        totals, _tri(nt, strict=True, dtype=jnp.float32), _ARGS,
        precision=_HI, preferred_element_type=jnp.float32)
    f = intile.reshape(rows, wp)
    hi = jnp.floor(f * (1.0 / 256.0))
    lo = f - hi * 256.0
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
    tcw = jnp.repeat(tc2d, 128, axis=1)
    s = s2d.astype(jnp.int32) + tcw + carry
    return s, s[rows - 1:, :]


def _kernel2(xa_ref, xb_ref, oa_ref, ob_ref, ca, cb):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ca[:] = jnp.zeros_like(ca)
        cb[:] = jnp.zeros_like(cb)

    sa, na = _scan_band(xa_ref[:], ca[:])
    sb, nb = _scan_band(xb_ref[:], cb[:])
    oa_ref[:] = sa
    ob_ref[:] = sb
    ca[:] = na
    cb[:] = nb


def make(band=48):
    @jax.jit
    def run(img):
        x, (h, w) = pad_to_multiple(jnp.asarray(img), 2 * band, 128,
                                    mode="constant")
        hp, wp = x.shape
        half = hp // 2
        nb = half // band
        xa = x[:half]
        xb = x[half:]
        oa, ob = pl.pallas_call(
            _kernel2,
            grid=(nb,),
            in_specs=[pl.BlockSpec((band, wp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec((band, wp), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((half, wp), jnp.int32)] * 2,
            scratch_shapes=[pltpu.VMEM((1, wp), jnp.int32)] * 2,
        )(xa, xb)
        ob = ob + oa[half - 1:, :]  # cross-half carry (VMEM-speed add)
        return jnp.concatenate([oa, ob], axis=0)[:h, :w]

    return run


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2160, 3840), dtype=np.uint8)
    ref = np.cumsum(np.cumsum(img.astype(np.int64), 0), 1).astype(np.int32)
    x = jnp.asarray(img)
    cases = [("J0_production", integral_pallas)]
    for band in (48, 32, 64):
        cases.append((f"J_twochain_b{band}", make(band)))
    for name, fn in cases:
        try:
            got = np.asarray(fn(x))
            exact = bool((got == ref).all())
            times = [time_stream_fn(fn, x, name=name).ms for _ in range(3)]
            best = min(times)
            print(f"{name}: {best:.4f} ms (3 reps: "
                  f"{', '.join(f'{t:.4f}' for t in times)}) exact={exact}"
                  f"  ({2160*3840/best/1e6:.1f} GPix/s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e).splitlines()[0][:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
