"""Pallas 2D prefix-scan (integral image), uint8 → int32.

Reference: Integral/integral_d.cu — 4-kernel hierarchical carry pipeline
(in-tile scans :13-59, Blelloch scans of tile carries :220-284/:504-593,
carry broadcast :716-749, driver hIntegral :863-893), needed because CUDA
thread blocks can't see each other's results within a launch.

TPU redesign: a Pallas grid on one core executes *sequentially*, so the carry
hierarchy collapses into two bandwidth-optimal passes:

- pass 1 (rows): independent row bands; in-VMEM cumsum along lanes.
- pass 2 (cols): grid (col-strips × row-bands) with the row-band dimension
  minor/sequential; a (1, strip) VMEM scratch carries the running column sum
  across bands (reset when a new col-strip starts). This is the reference's
  "scan of tile carries" at band radix, with zero extra HBM traffic.

Total HBM traffic ≈ read u8 + write i32 + read i32 + write i32 — the
speed-of-light for a 2-pass scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.layout import cdiv, pad_to_multiple
from tpuimg.kernels import interpret_mode

_ROW_BAND = 32   # u8 native sublane tiling
_COL_BAND = 256  # pass-2 rows per step
_COL_STRIP = 512  # pass-2 lanes per block


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


def _row_scan_kernel(x_ref, o_ref):
    """Row (lane) scan: per-128-lane-tile prefix sums as one triangular
    matmul on the MXU, then a tiny carry scan across tiles.

    Exactness: the triangular operand is 0/1 (products exact under any bf16
    split), in-tile sums ≤ 255·128 < 2^16 and carried totals ≤ 255·W < 2^24,
    all exact in f32 accumulation; the final int32 cast is lossless.
    """
    rows, wp = o_ref.shape
    nt = wp // 128
    # Mosaic has no direct u8→f32 cast; go through int32
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32).reshape(rows * nt, 128)
    # upper-triangular ones: cums[j] = Σ_{i<=j} x[i]
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    U = (i <= j).astype(jnp.float32)
    # u8 pixel values (≤255) are exactly representable in bf16, and U is 0/1,
    # so a single bf16 pass is exact with f32 accumulation
    intile = jax.lax.dot_general(
        x, U, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(rows, nt, 128)
    totals = intile[:, :, 127]  # (rows, nt)
    # exclusive cross-tile carry: strictly-lower-triangular matmul over nt
    a = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 1)
    L = (a < b).astype(jnp.float32)
    # tile totals need ≤16 mantissa bits (≤255·128): exact selection needs
    # multi-pass splitting; Mosaic only lowers DEFAULT and HIGHEST, and this
    # matmul is tiny, so HIGHEST costs nothing
    carry = jax.lax.dot_general(
        totals, L, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    out = intile + carry[:, :, None]
    o_ref[:] = out.reshape(rows, wp).astype(jnp.int32)


_SEG = 8  # column-scan segment height


def _col_scan_kernel(x_ref, o_ref, carry):
    """Column (sublane) scan, two-level: 3 roll-steps within 8-row segments,
    then a small scan of segment totals — int32 throughout (column totals
    exceed 2^24, so no float detour is allowed here)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, w = o_ref.shape
    x = x_ref[:]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    for shift in (1, 2, 4):
        rolled = pltpu.roll(x, shift, axis=0)
        x = x + jnp.where(idx % _SEG >= shift, rolled, 0)
    nseg = rows // _SEG
    totals = x.reshape(nseg, _SEG, w)[:, _SEG - 1]  # (nseg, w)
    seg_carry = _scan_shift(totals, axis=0) - totals  # exclusive
    expanded = jnp.broadcast_to(
        seg_carry[:, None, :], (nseg, _SEG, w)
    ).reshape(rows, w)
    s = x + expanded + carry[:]
    o_ref[:] = s
    carry[:] = s[rows - 1 :, :]


@functools.partial(jax.jit, static_argnames=())
def integral_pallas(img):
    """Inclusive 2D prefix sum of a (H, W) uint8/int image, int32."""
    if img.ndim != 2:
        return jax.vmap(integral_pallas)(img)
    x, (h, w) = pad_to_multiple(jnp.asarray(img), _ROW_BAND, _COL_STRIP, mode="constant")
    hp, wp = x.shape

    rows = pl.pallas_call(
        _row_scan_kernel,
        grid=(hp // _ROW_BAND,),
        in_specs=[
            pl.BlockSpec((_ROW_BAND, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (_ROW_BAND, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        interpret=interpret_mode(),
    )(x)

    band = min(_COL_BAND, hp)
    out = pl.pallas_call(
        _col_scan_kernel,
        grid=(wp // _COL_STRIP, cdiv(hp, band)),
        in_specs=[
            pl.BlockSpec((band, _COL_STRIP), lambda i, j: (j, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (band, _COL_STRIP), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, _COL_STRIP), jnp.int32)],
        interpret=interpret_mode(),
    )(rows)
    return out[:h, :w]
