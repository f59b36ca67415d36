"""Pallas 2D prefix-scan (integral image), uint8 → int32.

Reference: Integral/integral_d.cu — 4-kernel hierarchical carry pipeline
(in-tile scans :13-59, Blelloch scans of tile carries :220-284/:504-593,
carry broadcast :716-749, driver hIntegral :863-893), needed because CUDA
thread blocks can't see each other's results within a launch.

TPU redesign: a Pallas grid on one core executes *sequentially*, so the whole
carry hierarchy collapses into ONE fused pass over row bands:

- rows: per-128-lane-tile prefix sums as one bf16 triangular matmul on the
  MXU (exact: u8 values are bf16-exact, the triangular operand is 0/1) plus
  a tiny HIGHEST-precision cross-tile carry matmul;
- columns: two-level in-band scan (3 masked roll-adds within 8-row segments
  + a segment-total scan) in int32, with the running column carry held in a
  (1, W) VMEM scratch across the sequential band grid — the reference's
  "scan of tile carries" at band radix, with zero extra HBM traffic.

HBM traffic = one u8 read + one i32 write. Measured (honest streaming
protocol, v5e 4K): 0.25 ms = 33 GPix/s = 2.4x the reference's CUDA pipeline
(0.597 ms, Integral/readme.md:23). The kernel is VPU-bound, not
bandwidth-bound: a pure read+convert+write kernel measures 0.034 ms, the row
pass adds ~0.13 ms and the column pass ~0.09 ms
(scripts/probes/integral_r2_probe.py). Tuned variants that did NOT help,
measured round 2 — don't re-try without new evidence:
- bf16 triangular-matmul operands instead of f32: no change (0.252 vs 0.247
  — the cost is conversions/reshapes, not MXU passes);
- 3D dot_general avoiding the (rows, wp)->(rows*nt, 128) reshape: no change
  (0.250) — the reshape is vreg-granular and effectively free;
- band 256 instead of 128: worse (0.283) — larger carries, same op count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.layout import pad_to_multiple
from tpuimg.kernels import interpret_mode

_ROW_BAND = 32   # u8 native sublane tiling
_COL_BAND = 128  # fused-scan band rows


def _scan_shift(x, axis: int):
    """Inclusive prefix sum along ``axis`` via log2(n) masked roll-adds.

    Mosaic has no cumsum primitive; this is the classic Hillis-Steele scan on
    the VPU — ``pltpu.roll`` is a cheap lane/sublane rotation, and the mask
    zeroes the wrapped elements.
    """
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=axis)
        x = x + jnp.where(idx >= shift, rolled, 0)
        shift *= 2
    return x



_SEG = 8  # column-scan segment height



def _fused_scan_kernel(x_ref, o_ref, carry):
    """Full 2D scan in one HBM pass (see module docstring)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, wp = o_ref.shape
    nt = wp // 128
    # bf16 operands (u8 values and the 0/1 triangular matrix are bf16-exact;
    # accumulation is f32) — a native single-pass MXU matmul instead of the
    # 3-pass f32 form
    x = x_ref[:].astype(jnp.int32).astype(jnp.bfloat16).reshape(rows * nt, 128)
    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    U = (ii <= jj).astype(jnp.bfloat16)
    intile = jax.lax.dot_general(
        x, U, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(rows, nt, 128)
    totals = intile[:, :, 127]
    a = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 1)
    L = (a < b).astype(jnp.float32)
    tile_carry = jax.lax.dot_general(
        totals, L, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    r = ((intile + tile_carry[:, :, None]).reshape(rows, wp)).astype(jnp.int32)

    # in-band column scan (two-level) + cross-band carry
    idx = jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
    for shift in (1, 2, 4):
        rolled = pltpu.roll(r, shift, axis=0)
        r = r + jnp.where(idx % _SEG >= shift, rolled, 0)
    nseg = rows // _SEG
    seg_tot = r.reshape(nseg, _SEG, wp)[:, _SEG - 1]
    seg_carry = _scan_shift(seg_tot, axis=0) - seg_tot
    expanded = jnp.broadcast_to(
        seg_carry[:, None, :], (nseg, _SEG, wp)
    ).reshape(rows, wp)
    s = r + expanded + carry[:]
    o_ref[:] = s
    carry[:] = s[rows - 1 :, :]


@functools.partial(jax.jit, static_argnames=())
def integral_pallas(img):
    """Inclusive 2D prefix sum of a (H, W) uint8/int image, int32."""
    if img.ndim != 2:
        return jax.vmap(integral_pallas)(img)
    x, (h, w) = pad_to_multiple(jnp.asarray(img), _ROW_BAND, 128, mode="constant")
    hp, wp = x.shape
    band = min(_COL_BAND, hp)
    x, _ = pad_to_multiple(x, band, 128, mode="constant")
    hp = x.shape[0]

    out = pl.pallas_call(
        _fused_scan_kernel,
        grid=(hp // band,),
        in_specs=[
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((band, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, wp), jnp.int32)],
        interpret=interpret_mode(),
    )(x)
    return out[:h, :w]
