"""Fused one-pass separable stencil engine (Pallas).

Reference: gGaussOptim (GaussianFilter/gaussian.cu:181-306) — a rolling-strip
kernel that stages raw rows and row-filtered rows in smem ring buffers so each
pixel is read from global memory once; gMorphSplit (Morphology/
image_process.cu:173-299) is the same structure with min/max.

TPU redesign: no ring buffers — VMEM holds whole (band × W) blocks. The grid
walks row bands; each step streams three auto-pipelined views of the padded
image (the band plus 8-row top/bottom halo strips, so halo re-reads are ≤ 2·8
rows per band instead of a full re-fetch), does the x-reduction with lane
shifts and the y-reduction with sublane shifts in registers, and writes the
fused result. HBM traffic ≈ one read + one write of the image — half of the
two-pass XLA separable form.

Used for Gaussian (weighted sum, symmetric-kernel trick gaussian.cu:160-168)
and morphology (min/max, replicate border) via the ``reduce``/``weights``
parameters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.borders import REFLECT101, REPLICATE, pad_mode
from tpuimg.core.kernelgen import gaussian_kernel_1d
from tpuimg.core.layout import round_up
from tpuimg.kernels import interpret_mode
from tpuimg.kernels.window import window_extreme

def _halo_unit(dtype) -> int:
    """Minimum sublane granularity: (8,128) for 4-byte dtypes, (16,128) for
    2-byte, (32,128) for 1-byte (Mosaic rejects thinner blocks)."""
    return {1: 32, 2: 16}.get(jnp.dtype(dtype).itemsize, 8)


# VMEM band budget. The chip (v5e) has 128 MiB VMEM (probed round 2 with a
# 120 MB scratch), but bigger bands measured NO faster at 4K (10/32/64 MB
# budgets within noise) and raising the Mosaic vmem_limit_bytes to use them
# actively HURT (gaussian 0.28 -> 0.43 ms, guided 0.83 -> 0.97 — the
# compiler schedules better against its default limit). Keep the small
# budget; don't re-raise without new evidence.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_band(h: int, wp: int, dtype) -> int:
    """Row band sized to the VMEM budget: ~3 double-buffered input streams,
    one output stream, and the (band+2r, wp) intermediate must fit."""
    hu = _halo_unit(dtype)
    item = jnp.dtype(dtype).itemsize
    # bytes/row: 3 in-streams + 1 out stream, double-buffered, + ~2
    # intermediate planes at f32
    per_row = wp * (item * 8 + 4 * 2)
    band = _VMEM_BUDGET // per_row
    band = max(hu, min(512, (band // hu) * hu))
    return min(band, round_up(h, hu))


def _make_kernel(radius: int, band: int, wout: int, weights, is_min, hb: int):
    r = radius

    def x_reduce(t):
        if weights is not None:
            acc = jnp.float32(weights[r]) * t[:, r : r + wout]
            for k in range(1, r + 1):
                acc = acc + jnp.float32(weights[r - k]) * (
                    t[:, r - k : r - k + wout] + t[:, r + k : r + k + wout]
                )
            return acc
        # min/max: log-depth doubling windows (kernels/window.py) — the van
        # Herk/Gil-Werman role (Morphology/image_process.cu:31-170) at
        # O(log ksz) VPU ops, any radius
        fn = jnp.minimum if is_min else jnp.maximum
        return window_extreme(t, 2 * r + 1, wout, axis=1, fn=fn)

    def y_reduce(t):
        if weights is not None:
            acc = jnp.float32(weights[r]) * t[r : r + band]
            for k in range(1, r + 1):
                acc = acc + jnp.float32(weights[r - k]) * (
                    t[r - k : r - k + band] + t[r + k : r + k + band]
                )
            return acc
        fn = jnp.minimum if is_min else jnp.maximum
        return window_extreme(t, 2 * r + 1, band, axis=0, fn=fn)

    def kernel(top_ref, cur_ref, bot_ref, o_ref):
        t = jnp.concatenate(
            [top_ref[hb - r :], cur_ref[:], bot_ref[:r]], axis=0
        )  # (band + 2r, wp)
        o_ref[:] = y_reduce(x_reduce(t))

    return kernel


def _sep_stencil(img, radius: int, weights, is_min: bool, border: str):
    """Run the fused engine on a 2D image."""
    h, w = img.shape
    r = radius
    wout = round_up(w, 128)
    wp = round_up(wout + 2 * r, 128)
    hu = _halo_unit(img.dtype)
    hb = round_up(max(r, 1), hu)
    band = round_up(max(_pick_band(h, wp, img.dtype), hb), hb)
    hp = round_up(h, band)

    # reflect/replicate halo + alignment padding (values in the alignment
    # region never reach a valid output pixel)
    x = jnp.pad(img, ((r, r), (r, r)), mode=pad_mode(border))
    x = jnp.pad(x, ((band - r, hp - h - r + hb), (0, wp - w - 2 * r)), mode="edge")
    # rows: [band - r, band + h + r) hold the halo-padded image

    kernel = _make_kernel(r, band, wout, weights, is_min, hb)
    bpr = band // hb  # halo-blocks per band

    out = pl.pallas_call(
        kernel,
        grid=(hp // band,),
        in_specs=[
            # top halo strip: rows [ (i+1)*band - hb, (i+1)*band )
            pl.BlockSpec((hb, wp), lambda i: ((i + 1) * bpr - 1, 0),
                         memory_space=pltpu.VMEM),
            # current band: rows [ (i+1)*band, (i+2)*band )
            pl.BlockSpec((band, wp), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            # bottom halo strip: rows [ (i+2)*band, (i+2)*band + hb )
            pl.BlockSpec((hb, wp), lambda i: ((i + 2) * bpr, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, wout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wout), img.dtype),
        interpret=interpret_mode(),
    )(x, x, x)
    return out[:h, :w]


def _open_close_kernel(r: int, band: int, wout: int, w: int, h: int,
                       first_min: bool, hb: int):
    """Fused open/close: stage-1 extreme on a (band+2r, wout+2r) extent from
    a 2r halo, stage-2 extreme of the opposite sense on the band.

    The composed op's replicate border acts on the STAGE-1 RESULT, so
    stage-1 values outside the image must be clamped to the nearest valid
    row/column (a fresh extreme over replicated raw pixels would differ:
    its window is a subset, so its min is >= the true edge value).
    """
    ksz = 2 * r + 1
    fn1 = jnp.minimum if first_min else jnp.maximum
    fn2 = jnp.maximum if first_min else jnp.minimum

    def kernel(top_ref, cur_ref, bot_ref, o_ref):
        i = pl.program_id(0)
        t = jnp.concatenate(
            [top_ref[hb - 2 * r :], cur_ref[:], bot_ref[: 2 * r]], axis=0
        )  # (band + 4r, wp)
        s1 = window_extreme(t, ksz, wout + 2 * r, axis=1, fn=fn1)
        s1 = window_extreme(s1, ksz, band + 2 * r, axis=0, fn=fn1)
        # s1 lane l <-> stage-1 column x = l - r; clamp x to [0, w)
        left = jnp.broadcast_to(s1[:, r : r + 1], (band + 2 * r, r))
        right = jnp.broadcast_to(
            s1[:, w + r - 1 : w + r], (band + 2 * r, wout + r - w))
        s1 = jnp.concatenate([left, s1[:, r : w + r], right], axis=1)
        # s1 row j <-> stage-1 global row gy = i*band - r + j; clamp to [0, h)
        gy = (jax.lax.broadcasted_iota(jnp.int32, (band + 2 * r, 1), 0)
              + i * band - r)
        s1 = jnp.where(gy < 0, s1[r : r + 1, :], s1)
        # Mosaic has no dynamic_slice on values: extract the clamp row
        # (stage-1 row of global row h-1) with a masked reduction instead
        jh = jnp.clip(h - 1 + r - i * band, 0, band + 2 * r - 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, s1.shape, 0)
        bot_row = jnp.max(jnp.where(rows == jh, s1, s1.dtype.type(-jnp.inf)
                                    if jnp.issubdtype(s1.dtype, jnp.floating)
                                    else jnp.iinfo(s1.dtype).min),
                          axis=0, keepdims=True)
        s1 = jnp.where(gy > h - 1, bot_row, s1)
        s2 = window_extreme(s1, ksz, wout, axis=1, fn=fn2)
        o_ref[:] = window_extreme(s2, ksz, band, axis=0, fn=fn2)

    return kernel


def _open_close(img, radius: int, first_min: bool):
    """Fused open (erode then dilate) / close on a 2D image — one HBM pass
    where the composed form is two (the reference composes two full
    hMorphology launches, morphology.cpp:25-60)."""
    h, w = img.shape
    r = radius
    wout = round_up(w, 128)
    wp = round_up(wout + 4 * r, 128)
    hu = _halo_unit(img.dtype)
    hb = round_up(2 * r, hu)
    band = round_up(max(_pick_band(h, wp, img.dtype), hb), hb)
    hp = round_up(h, band)

    x = jnp.pad(img, ((2 * r, 2 * r), (2 * r, 2 * r)), mode="edge")
    x = jnp.pad(x, ((band - 2 * r, hp - h - 2 * r + hb),
                    (0, wp - w - 4 * r)), mode="edge")

    kernel = _open_close_kernel(r, band, wout, w, h, first_min, hb)
    bpr = band // hb
    out = pl.pallas_call(
        kernel,
        grid=(hp // band,),
        in_specs=[
            pl.BlockSpec((hb, wp), lambda i: ((i + 1) * bpr - 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, wp), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, wp), lambda i: ((i + 2) * bpr, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, wout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wout), img.dtype),
        interpret=interpret_mode(),
    )(x, x, x)
    return out[:h, :w]


def open_close_pallas(img, radius: int, mode: int):
    """Fused morphological open (mode 0) / close (mode 1), replicate border.
    uint8 widens like morphology_pallas."""
    img = jnp.asarray(img)
    first_min = mode == 0  # open erodes (min) first
    if img.dtype == jnp.uint8:
        return _over_batch(
            lambda v: _open_close(
                v.astype(jnp.int32).astype(_U8_WIDEN), radius, first_min
            ).astype(jnp.int32).astype(jnp.uint8),
            img)
    return _over_batch(lambda v: _open_close(v, radius, first_min), img)


def _over_batch(fn, img):
    """Apply a 2D kernel over leading dims: small batches unroll into
    separate pallas_calls (measured 1.4x faster than vmap on v5e — vmap adds
    a batch grid dim that serializes poorly with the halo views); large
    batches fall back to vmap to bound program size."""
    if img.ndim == 2:
        return fn(img)
    if img.ndim == 3 and img.shape[0] <= 8:
        return jnp.stack([fn(img[i]) for i in range(img.shape[0])])
    return jax.vmap(lambda v: _over_batch(fn, v))(img)


def gaussian_pallas(img, radius: int, sigma: float):
    """Fused separable Gaussian (reflect-101), one HBM pass."""
    w = [float(v) for v in np.asarray(gaussian_kernel_1d(2 * radius + 1, sigma))]
    return _over_batch(
        lambda v: _sep_stencil(jnp.asarray(v, jnp.float32), radius, w, False,
                               REFLECT101),
        jnp.asarray(img))


# compute dtype for u8 morphology: Mosaic rejects u8-native MIN/MAX blocks
# for this kernel shape (probed round 2), so widen minimally — bf16 halves
# the VMEM and HBM traffic of the round-1 int32 widening, and min/max over
# integers <= 255 is bf16-exact. u8 BLOCKS with an in-kernel cast to bf16
# (skipping the XLA widen/narrow passes entirely) DO compile and are exact,
# but measured no faster: open r15 batch2 0.870 -> 0.848 ms (noise), single
# erode r15 0.280 -> 0.302 ms (WORSE) — XLA already fuses the widen into
# the pad and the kernel is VPU-bound; keep the simpler widened form.
_U8_WIDEN = jnp.bfloat16


def morphology_pallas(img, radius: int, mode: int):
    """Fused separable erode (mode 0) / dilate (mode 1), replicate border.

    uint8 inputs are widened (see _U8_WIDEN) for the kernel and narrowed
    back — results identical.
    """
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        return _over_batch(
            lambda v: _sep_stencil(
                v.astype(jnp.int32).astype(_U8_WIDEN), radius, None,
                mode == 0, REPLICATE
            ).astype(jnp.int32).astype(jnp.uint8),
            img)
    return _over_batch(
        lambda v: _sep_stencil(v, radius, None, mode == 0, REPLICATE), img)
