"""Pallas LUT kernels built on the TPU's lane dynamic-gather.

Mosaic exposes ``tpu.dynamic_gather`` for equal-shaped take_along_axis with a
128-lane operand tile (axis=1). A 256-entry LUT therefore becomes two
128-wide gathers + a select — a handful of VPU ops per pixel instead of the
one-hot MXU contraction (kernels/onehot.py), which needs ~100x more arithmetic
for exact f32 tables.

Two kernels:
- ``lut_gather``: uniform 256-entry table over the whole image (the HE
  mapping, gMapping image_process.cu:127-136).
- ``clahe_region_map``: the CLAHE bilinear 4-LUT blend for one constant-LUT
  region (gInterpolateMappingUnroll image_process.cu:428-471) — 4 tables
  gathered and blended in-kernel, with the xa/ya interpolation weights
  recomputed from SMEM scalars using the reference's exact f32 formulas
  (__fmul_rn by the x reciprocal, __fdiv_rn for y, trunc'd base indices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.layout import round_up
from tpuimg.kernels import interpret_mode

_BR = 64  # rows per grid step (multiple of 32 so u8 blocks stay legal)


def _gather256(tab_lo, tab_hi, idx, rows):
    """value[idx] for idx in [0,256) from two broadcast 128-entry halves."""
    lo = jnp.minimum(idx, 127)
    hi = jnp.maximum(idx - 128, 0)
    v_lo = jnp.take_along_axis(
        jnp.broadcast_to(tab_lo, (rows, 128)), lo, axis=1,
        mode="promise_in_bounds",
    )
    v_hi = jnp.take_along_axis(
        jnp.broadcast_to(tab_hi, (rows, 128)), hi, axis=1,
        mode="promise_in_bounds",
    )
    return jnp.where(idx < 128, v_lo, v_hi)


def _lut_kernel(tab_ref, x_ref, o_ref):
    rows, wp = x_ref.shape
    for t in range(wp // 128):
        ts = slice(t * 128, (t + 1) * 128)
        idx = x_ref[:, ts].astype(jnp.int32)
        o_ref[:, ts] = _gather256(
            tab_ref[0:1, :], tab_ref[1:2, :], idx, rows
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def lut_gather(table, img):
    """dst = table[img] via lane dynamic-gather; table (256,), img u8 (H, W)."""
    h, w = img.shape
    hp, wp = round_up(h, _BR), round_up(w, 128)
    x = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    tab2 = table.astype(jnp.int32).reshape(2, 128)
    out = pl.pallas_call(
        _lut_kernel,
        grid=(hp // _BR,),
        in_specs=[
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BR, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        interpret=interpret_mode(),
    )(tab2, x)
    return out[:h, :w].astype(table.dtype)


def _region_kernel(s_ref, tab_ref, x_ref, o_ref):
    """One CLAHE constant-LUT region.

    s_ref (1, 8) SMEM f32: [pad_left, inv_tw, tx1, pad_top, th, ty1, y0, x0]
    tab_ref (8, 128) VMEM f32: t11_lo, t11_hi, t12_lo, t12_hi, t21.., t22..
    """
    pad_left, inv_tw, tx1 = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2]
    pad_top, th, ty1 = s_ref[0, 3], s_ref[0, 4], s_ref[0, 5]
    y0, x0 = s_ref[0, 6], s_ref[0, 7]
    i = pl.program_id(0)
    rows, wp = x_ref.shape

    gy = (jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0).astype(jnp.float32)
          + (y0 + jnp.float32(i * rows)))
    tyf = (gy + pad_top) / th - jnp.float32(0.5)  # __fdiv_rn semantics
    ya = tyf - ty1
    ya1 = jnp.float32(1.0) - ya

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1).astype(jnp.float32)
    for t in range(wp // 128):
        ts = slice(t * 128, (t + 1) * 128)
        gx = lane + (x0 + jnp.float32(t * 128))
        txf = (gx + pad_left) * inv_tw - jnp.float32(0.5)  # __fmul_rn(rcp)
        xa = txf - tx1
        xa1 = jnp.float32(1.0) - xa

        idx = x_ref[:, ts].astype(jnp.int32)
        t11 = _gather256(tab_ref[0:1, :], tab_ref[1:2, :], idx, rows)
        t12 = _gather256(tab_ref[2:3, :], tab_ref[3:4, :], idx, rows)
        t21 = _gather256(tab_ref[4:5, :], tab_ref[5:6, :], idx, rows)
        t22 = _gather256(tab_ref[6:7, :], tab_ref[7:8, :], idx, rows)
        out = (t11 * xa1 + t12 * xa) * ya1 + (t21 * xa1 + t22 * xa) * ya
        # float → uchar assignment truncates (with clamp) on the device;
        # Mosaic has no f32→u8 cast, so round-trip through i32
        o_ref[:, ts] = (
            jnp.clip(jnp.trunc(out), 0.0, 255.0)
            .astype(jnp.int32)
            .astype(jnp.uint8)
        )


def clahe_region_map(v, tables4, *, y0, x0, pad_left, inv_tw, tx1, pad_top,
                     th, ty1):
    """Map one region: v u8 (Rh, Rw); tables4 (4, 256) f32 in t11,t12,t21,t22
    order. Returns u8 (Rh, Rw)."""
    rh, rw = v.shape
    hp, wp = round_up(rh, _BR), round_up(rw, 128)
    x = jnp.pad(v, ((0, hp - rh), (0, wp - rw)))
    tabs = tables4.astype(jnp.float32).reshape(8, 128)
    scalars = jnp.asarray(
        [[pad_left, inv_tw, tx1, pad_top, th, ty1, y0, x0]], jnp.float32
    )
    out = pl.pallas_call(
        _region_kernel,
        grid=(hp // _BR,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BR, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint8),
        interpret=interpret_mode(),
    )(scalars, tabs, x)
    return out[:rh, :rw]
