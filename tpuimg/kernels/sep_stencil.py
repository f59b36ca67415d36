"""Fused one-pass separable stencil engine (Pallas).

Reference: gGaussOptim (GaussianFilter/gaussian.cu:181-306) — a rolling-strip
kernel that stages raw rows and row-filtered rows in smem ring buffers so each
pixel is read from global memory once; gMorphSplit (Morphology/
image_process.cu:173-299) is the same structure with min/max.

TPU redesign: no ring buffers — VMEM holds whole (band × W) blocks. The grid
walks row bands; each step streams three auto-pipelined views of the RAW
image (the band plus top/bottom halo strips), builds the border halo INSIDE
the kernel — reflect-101/replicate row fixes from in-tile slices, x extension
by lane concatenation — exactly as the reference does its border math inside
gGaussOptim (reflectBorder, gaussian.h:101, used at gaussian.cu:214-234).
There is NO pre-kernel jnp.pad: HBM traffic is one read of the image (+ a
2·hb-row halo re-read per band) and one write of the result. The round-2
version pre-padded the frame with two jnp.pad copies, which cost a full
extra HBM round-trip and made the engine lose to the two-pass XLA form.

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
from tpuimg.core.layout import cdiv, round_up
from tpuimg.kernels import interpret_mode
from tpuimg.kernels.window import window_extreme


def _halo_unit(dtype) -> int:
    """Minimum sublane granularity: (8,128) for 4-byte dtypes, (16,128) for
    2-byte, (32,128) for 1-byte (Mosaic rejects thinner blocks)."""
    return {1: 32, 2: 16}.get(jnp.dtype(dtype).itemsize, 8)


# VMEM band budget. Round-2 measured bigger budgets as useless, but that was
# with pre-kernel pad copies dominating; with in-kernel borders (round 3) the
# halo re-read is 2·hb/band of the input stream, so bigger bands win:
# erode r15 4K 0.140 ms @ 10 MB → 0.117 @ 40 MB, plateau at 80 MB
# (/tmp/probe_band.log, 2026-08-17). 40 MB it is.
_VMEM_BUDGET = 40 * 1024 * 1024

# The f32 weighted (gaussian) kernel fails TPU compilation at 4K for bands
# ≥ 120 rows (tpu_compile_helper exit 1; bisected 112 ok / 120 fail,
# r7 w=3840). 112 also measures best: r7 sweep 56:0.476 64:0.470 72:0.442
# 80:0.431 96:0.437 112:0.448 — the aligned-band search below then lands
# 80 for h=2160. Min/max kernels are unaffected (band 432 compiles + wins).
_WEIGHTS_BAND_CAP = 112

# The two-stage open/close kernel (4r halos) hits the same compiler failure
# above ~band 300 at 4K under the 40 MB budget; 64..288 all compile and the
# curve flattens: r15 0.333/0.301/0.272/0.269/0.254/0.248 ms at
# 64/96/128/160/224/288 (/tmp/probe_oc.log 2026-08-17).
_OC_BAND_CAP = 288


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


def _aligned_band(h: int, band: int, hb: int) -> int:
    """Prefer a band that divides ``h`` exactly (within ~half the budget
    band): the bottom border fix then lands on the static bot-halo slice
    instead of a masked full-tile pass. Returns 0 if none exists."""
    b = (band // hb) * hb
    while b >= max(hb, band // 2):
        if h % b == 0:
            return b
        b -= hb
    return 0


def _neutral(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(-jnp.inf, dtype)
    return jnp.asarray(jnp.iinfo(dtype).min, dtype)


def _extract_row(tv, j):
    """Row ``j`` (traced scalar) of a 2D value, as (1, W). Mosaic has no
    dynamic_slice on values, so extract via a masked max-reduction (the
    source row must hold valid data, which all callers guarantee)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, tv.shape, 0)
    return jnp.max(jnp.where(rows == j, tv, _neutral(tv.dtype)), axis=0,
                   keepdims=True)


def _assemble_rows(top_ref, cur_ref, bot_ref, i, d: int, hb: int, band: int,
                   h: int, reflect: bool, h_aligned: bool, nb: int,
):
    """Assemble a (band + 2d, W) tile from the three halo views with the
    y border policy applied in-kernel.

    Band 0's top halo and (when ``h_aligned``) the last band's bottom halo
    are rebuilt from static in-tile row slices — (d, W) selects only. When
    the band doesn't divide h, the bottom border rows sit mid-tile at a
    dynamic row, fixed with masked full-tile selects (the masks are false
    on unaffected bands).
    """
    if reflect and band <= d:
        raise ValueError(
            f"reflect border assembly needs band > halo depth ({band} <= {d})")
    cur = cur_ref[:]
    if reflect:
        # rows d, d-1, ..., 1 (lax.rev is not lowerable in Mosaic)
        top_fix = jnp.concatenate(
            [cur[d - j : d - j + 1] for j in range(d)], axis=0)
    else:
        top_fix = jnp.broadcast_to(cur[0:1], (d, cur.shape[1]))
    top = jnp.where(i == 0, top_fix, top_ref[hb - d :])
    if h_aligned:
        if reflect:
            # rows band-2, ..., band-1-d
            bot_fix = jnp.concatenate(
                [cur[band - 2 - m : band - 1 - m] for m in range(d)], axis=0)
        else:
            bot_fix = jnp.broadcast_to(cur[band - 1 : band],
                                       (d, cur.shape[1]))
        bot = jnp.where(i == nb - 1, bot_fix, bot_ref[:d])
    else:
        bot = bot_ref[:d]
    t = jnp.concatenate([top, cur, bot], axis=0)  # (band + 2d, W)
    if not h_aligned:
        jh = h - 1 + d - i * band  # tile row of image row h-1
        rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        if reflect:
            for m in range(1, d + 1):
                t = jnp.where(rows == jh + m, _extract_row(t, jh - m), t)
        else:
            t = jnp.where(rows > jh, _extract_row(t, jh), t)
    return t


def _x_extend(tv, d: int, w_in: int, wout: int, reflect: bool,
              lo: int = 0, hi: int = 0):
    """Extend a tile to ``d`` halo columns per side, in-kernel.

    ``tv`` holds ``w_in`` valid lanes of which the first ``lo`` and last
    ``hi`` are REAL halo columns (from a neighboring column strip); the
    remaining w_out = w_in - lo - hi are the strip's own columns. Missing
    halo (lo or hi == 0 ⇒ frame edge) is synthesized as reflect-101
    (reflectBorder, gaussian.h:101) or replicate (image_process.cu:188-191)
    border columns. lo/hi must be 0 or d (strips ≥ d wide).

    Returns ``(ext, off)`` with ext lane ``off + c`` ↔ strip output column
    ``c``; lanes [off - d, off + wout + d) are a valid stencil extent (the
    tail beyond w_out is don't-care and only feeds cropped outputs). The
    main block is placed at a 128-aligned lane offset: concatenating it at
    offset d would lane-rotate the WHOLE tile (a full-tile Mosaic relayout
    per band — measured +12% on the guided one-pass kernel).
    """
    rows = tv.shape[0]

    def dontcare(n):  # constant don't-care lanes (cheaper than data slices)
        return jnp.zeros((rows, n), tv.dtype)

    parts = []
    if lo == 0 and d > 0:
        # tv lands at a 128-aligned lane: no rotate, left border fits before
        off = round_up(d, 128)
        if off > d:
            parts.append(dontcare(off - d))
        if reflect:
            # d single-lane inserts: Mosaic cannot lower lax.rev (jnp.flip),
            # so a one-op lane reversal is unavailable in compiled kernels
            parts += [tv[:, d - j : d - j + 1] for j in range(d)]
        else:
            parts.append(jnp.broadcast_to(tv[:, 0:1], (rows, d)))
    else:
        off = lo  # real halo included in tv; tv lands at lane 0
    parts.append(tv[:, :w_in])
    if hi == 0 and d > 0:
        e = w_in - 1  # last valid lane (frame edge column)
        if reflect:
            parts += [tv[:, e - 1 - m : e - m] for m in range(d)]
        else:
            parts.append(jnp.broadcast_to(tv[:, e : e + 1], (rows, d)))
    # pad to a 128-lane multiple so downstream values stay layout-friendly
    have = (off - lo) + w_in + (d - hi)
    target = round_up(off + wout + d, 128)
    if target > have:
        parts.append(dontcare(target - have))
    return jnp.concatenate(parts, axis=1), off


def _make_kernel(radius: int, band: int, w_in: int, wout: int, h: int,
                 weights, is_min, hb: int, reflect: bool, h_aligned: bool,
                 lo: int = 0, hi: int = 0):
    r = radius
    nb = cdiv(h, band)

    def x_reduce(t, off):
        if weights is not None:
            acc = jnp.float32(weights[r]) * t[:, off : off + wout]
            for k in range(1, r + 1):
                acc = acc + jnp.float32(weights[r - k]) * (
                    t[:, off - k : off - k + wout]
                    + t[:, off + k : off + k + wout]
                )
            return acc
        # min/max: log-depth doubling windows (kernels/window.py) — the van
        # Herk/Gil-Werman role (Morphology/image_process.cu:31-170) at
        # O(log ksz) VPU ops, any radius
        fn = jnp.minimum if is_min else jnp.maximum
        return window_extreme(t, 2 * r + 1, wout, axis=1, fn=fn,
                              start=off - r)

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
        i = pl.program_id(0)
        t = _assemble_rows(top_ref, cur_ref, bot_ref, i, r, hb, band, h,
                           reflect, h_aligned, nb)
        ext, off = _x_extend(t, r, w_in, wout, reflect, lo, hi)
        o_ref[:] = y_reduce(x_reduce(ext, off))

    return kernel


def _band_specs(band: int, hb: int, wb: int, h: int):
    """Three overlapping row views of the RAW (h, w) image: top halo strip,
    current band, bottom halo strip. Index maps clamp at the image edges
    (band 0's top / last band's bottom then hold garbage rows, which the
    in-kernel border fixes overwrite)."""
    bpr = band // hb
    nbh = cdiv(h, hb)
    return [
        pl.BlockSpec((hb, wb), lambda i: (jnp.maximum(i * bpr - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((band, wb), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, wb),
                     lambda i: (jnp.minimum((i + 1) * bpr, nbh - 1), 0),
                     memory_space=pltpu.VMEM),
    ]


# Widest lane block the weighted/min-max band kernels compile at: 4K frames
# (3968 lanes) work, 8K (7680) fail TPU compilation. Wider frames run in
# column strips whose interior edges carry REAL halo columns.
_MAX_LANES = 4096


def _sep_stencil(img, radius: int, weights, is_min: bool, border: str,
                 lo: int = 0, hi: int = 0):
    """Run the fused engine on a raw 2D image — borders in-kernel.

    ``lo``/``hi``: real halo columns already present at the left/right edge
    (column-strip decomposition of wide frames); 0 means frame edge (border
    policy applies).
    """
    h, w_in = img.shape
    r = radius
    w_out = w_in - lo - hi
    reflect = pad_mode(border) == "reflect"
    if reflect and (h <= r or w_out <= r):
        raise ValueError(
            f"reflect-101 border needs H, W > radius; got {h}x{w_out}, r={r}")
    wout = round_up(w_out, 128)
    wb = round_up(w_in, 128)  # input lane block; lanes ≥ w_in are don't-care
    hu = _halo_unit(img.dtype)
    hb = round_up(max(r, 1), hu)
    # reflect row fixes read cur[r - j] / cur[band - 2 - m]: band > r needed
    band_min = round_up(r + 2, hb) if reflect else hb
    band = round_up(max(_pick_band(h, wb, img.dtype), band_min), hb)
    if weights is not None:
        band = min(band, max(band_min, (_WEIGHTS_BAND_CAP // hb) * hb))
    band = min(band, max(band_min, round_up(h, hb)))
    ab = _aligned_band(h, band, hb)
    if ab and h % band != 0 and ab >= band_min:
        band = ab
    h_aligned = h % band == 0
    if not h_aligned and reflect and r > 16:
        # the masked dynamic reflect fix costs r full-tile extract passes;
        # past ~16 Mosaic compile time explodes (see boxsum). Rare shapes
        # pay one row-pad copy and run the fix-free ypadded kernel.
        pad = jnp.pad(img, ((r, r), (0, 0)), mode=pad_mode(border))
        return _sep_stencil_ypadded(pad, r, weights, is_min, border,
                                    lo, hi)

    kernel = _make_kernel(r, band, w_in, wout, h, weights, is_min, hb,
                          reflect, h_aligned, lo, hi)
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(h, band),),
        in_specs=_band_specs(band, hb, wb, h),
        out_specs=pl.BlockSpec((band, wout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w_out), img.dtype),
        interpret=interpret_mode(),
    )(img, img, img)
    return out


def column_strips(fn, imgs, d: int, max_lanes: int):
    """Apply ``fn(seg..., lo, hi)`` over column strips.

    ``imgs`` is one array or a tuple of same-width arrays sliced
    identically (the guided filter's I and P). Frames at most ``max_lanes``
    wide go through whole; wider frames are split into strips whose slices
    carry ``d`` REAL halo columns from the neighboring strip (lo/hi = halo
    actually present; 0 at frame edges where the border policy applies).
    A tail thinner than the halo is absorbed into the previous strip."""
    single = not isinstance(imgs, (tuple, list))
    if single:
        imgs = (imgs,)
    w = imgs[0].shape[-1]
    if w <= max_lanes:
        return fn(*imgs, 0, 0)
    step = max_lanes - 2 * d - 128  # halo + tail-absorb headroom
    if step <= 0:
        # unguarded, step<=0 would loop forever (or emit a zero-width strip
        # that dies deep in Mosaic with "vector types must have positive
        # constant sizes") — round-3 review finding
        raise ValueError(
            f"halo depth {d} too large for {max_lanes}-lane strips of a "
            f"{w}-wide frame (strip step {step} <= 0); reduce the radius")
    outs = []
    x0 = 0
    while x0 < w:
        x1 = min(w, x0 + step)
        if w - x1 <= d:
            x1 = w
        lo = min(d, x0)
        hi = d if x1 < w else 0
        segs = [jax.lax.slice_in_dim(im, x0 - lo, x1 + hi, axis=-1)
                for im in imgs]
        outs.append(fn(*segs, lo, hi))
        x0 = x1
    return jnp.concatenate(outs, axis=-1)


def _sep_stencil_strips(img, radius: int, weights, is_min: bool, border: str):
    """Column-strip driver: frames wider than _MAX_LANES are processed in
    strips with real halo columns (one slice copy per strip — still ~1.4x
    faster than the XLA strip path at 8K)."""
    return column_strips(
        lambda seg, lo, hi: _sep_stencil(seg, radius, weights, is_min,
                                         border, lo=lo, hi=hi),
        img, radius, _MAX_LANES)


def _sep_stencil_ypadded(x, radius: int, weights, is_min: bool, border: str,
                         lo: int = 0, hi: int = 0):
    """Fused engine on a block whose row axis is ALREADY padded by ``radius``
    rows per side (halo rows from a neighbor shard, or border rows applied
    by the sharding layer). x borders are still built in-kernel. Entry point
    for parallel.stencil_sharded — each shard runs the fused Pallas chain
    (the reference analog each shard should execute: gGaussOptim /
    gMorphSplit) instead of the XLA fallback."""
    hin, w_in = x.shape
    r = radius
    h = hin - 2 * r  # output rows
    w = w_in - lo - hi
    reflect = pad_mode(border) == "reflect"
    if h < 1:
        raise ValueError(f"ypadded block must have > 2*radius rows; got {hin}")
    wout = round_up(w, 128)
    wb = round_up(w_in, 128)
    hu = _halo_unit(x.dtype)
    hb = round_up(max(2 * r, 1), hu)
    band = round_up(max(_pick_band(h, wb, x.dtype), hb), hb)
    if weights is not None:
        band = min(band, max(hb, (_WEIGHTS_BAND_CAP // hb) * hb))
    band = min(band, round_up(h, hb))
    nbh = cdiv(hin, hb)

    def kernel(cur_ref, bot_ref, o_ref):
        t = jnp.concatenate([cur_ref[:], bot_ref[: 2 * r]], axis=0)
        ext, off = _x_extend(t, r, w_in, wout, reflect, lo, hi)
        if weights is not None:
            acc = jnp.float32(weights[r]) * ext[:, off : off + wout]
            for k in range(1, r + 1):
                acc = acc + jnp.float32(weights[r - k]) * (
                    ext[:, off - k : off - k + wout]
                    + ext[:, off + k : off + k + wout])
            rowf = acc
            accy = jnp.float32(weights[r]) * rowf[r : r + band]
            for k in range(1, r + 1):
                accy = accy + jnp.float32(weights[r - k]) * (
                    rowf[r - k : r - k + band] + rowf[r + k : r + k + band])
            o_ref[:] = accy
        else:
            fn = jnp.minimum if is_min else jnp.maximum
            rowf = window_extreme(ext, 2 * r + 1, wout, axis=1, fn=fn,
                                  start=off - r)
            o_ref[:] = window_extreme(rowf, 2 * r + 1, band, axis=0, fn=fn)

    out = pl.pallas_call(
        kernel,
        grid=(cdiv(h, band),),
        in_specs=[
            pl.BlockSpec((band, wb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, wb),
                         lambda i: (jnp.minimum((i + 1) * (band // hb),
                                                nbh - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, wout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), x.dtype),
        interpret=interpret_mode(),
    )(x, x)
    return out


def _open_close_kernel(r: int, band: int, w: int, wout: int, h: int,
                       first_min: bool, hb: int, h_aligned: bool):
    """Fused open/close: stage-1 extreme on a (band+2r, wout+2r) extent from
    a 2r halo, stage-2 extreme of the opposite sense on the band.

    Border = replicate, built in-kernel (depth 2r). The composed op's
    replicate border acts on the STAGE-1 RESULT, so stage-1 values outside
    the image must be clamped to the nearest valid row/column (a fresh
    extreme over replicated raw pixels would differ: its window is a subset,
    so its min is >= the true edge value).
    """
    ksz = 2 * r + 1
    fn1 = jnp.minimum if first_min else jnp.maximum
    fn2 = jnp.maximum if first_min else jnp.minimum
    nb = cdiv(h, band)

    def kernel(top_ref, cur_ref, bot_ref, o_ref):
        i = pl.program_id(0)
        t = _assemble_rows(top_ref, cur_ref, bot_ref, i, 2 * r, hb, band, h,
                           False, h_aligned, nb)  # (band+4r, W)
        ext, off = _x_extend(t, 2 * r, w, wout, False)
        # s1 lane l ↔ stage-1 column x = l - r
        s1 = window_extreme(ext, ksz, wout + 2 * r, axis=1, fn=fn1,
                            start=off - 2 * r)
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
        jh1 = jnp.clip(h - 1 + r - i * band, 0, band + 2 * r - 1)
        s1 = jnp.where(gy > h - 1, _extract_row(s1, jh1), s1)
        s2 = window_extreme(s1, ksz, wout, axis=1, fn=fn2)
        o_ref[:] = window_extreme(s2, ksz, band, axis=0, fn=fn2)

    return kernel


def _open_close(img, radius: int, first_min: bool):
    """Fused open (erode then dilate) / close on a 2D image — one HBM pass
    where the composed form is two (the reference composes two full
    hMorphology launches, morphology.cpp:25-60). Borders in-kernel."""
    h, w = img.shape
    r = radius
    wout = round_up(w, 128)
    hu = _halo_unit(img.dtype)
    hb = round_up(2 * r, hu)
    band = round_up(max(_pick_band(h, wout, img.dtype), hb), hb)
    band = min(band, max(hb, (_OC_BAND_CAP // hb) * hb))
    band = min(band, round_up(h, hb))
    ab = _aligned_band(h, band, hb)
    if ab and h % band != 0:
        band = ab
    h_aligned = h % band == 0

    kernel = _open_close_kernel(r, band, w, wout, h, first_min, hb,
                                h_aligned)
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(h, band),),
        in_specs=_band_specs(band, hb, wout, h),
        out_specs=pl.BlockSpec((band, wout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), img.dtype),
        interpret=interpret_mode(),
    )(img, img, img)
    return out


def open_close_pallas(img, radius: int, mode: int):
    """Fused morphological open (mode 0) / close (mode 1), replicate border.
    uint8 is widened to bf16 OUTSIDE the kernel and narrowed after — XLA
    fuses the widen into its pad, and the in-kernel-widen variant measured
    slower (see the u8-native note below _OC_BAND_CAP). Frames wider than
    _MAX_LANES compose two strip-stencil passes instead (the fused kernel's
    lane block would not compile)."""
    img = jnp.asarray(img)
    first_min = mode == 0  # open erodes (min) first
    if img.shape[-1] > _MAX_LANES:
        stage1 = morphology_pallas(img, radius, 0 if first_min else 1)
        return morphology_pallas(stage1, radius, 1 if first_min else 0)
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
        lambda v: _sep_stencil_strips(jnp.asarray(v, jnp.float32), radius, w,
                                      False, REFLECT101),
        jnp.asarray(img))


def gaussian_pallas_ypadded(x, radius: int, sigma: float):
    """Fused Gaussian on a row-padded block (see _sep_stencil_ypadded)."""
    w = [float(v) for v in np.asarray(gaussian_kernel_1d(2 * radius + 1, sigma))]
    return _over_batch(
        lambda v: column_strips(
            lambda seg, lo, hi: _sep_stencil_ypadded(
                jnp.asarray(seg, jnp.float32), radius, w, False, REFLECT101,
                lo=lo, hi=hi),
            v, radius, _MAX_LANES),
        jnp.asarray(x))


# compute dtype for u8 morphology: widen to bf16 OUTSIDE the kernel (min/max
# over integers <= 255 is bf16-exact). Re-probed round 3 with the in-kernel
# borders: u8-native blocks + an in-kernel load cast are exact but SLOWER —
# erode r2 0.114 vs 0.080 ms, r15 0.158 vs 0.117 (/tmp/probe_u8.log
# 2026-08-17) — the (32,128) u8 tile granularity doubles the halo block
# height (hb 32 vs 16) and the load-cast costs more than the XLA
# widen/narrow passes it saves. The in-kernel-cast plumbing was removed
# after the probe (round-3 review); re-add a compute_dtype hook only with
# new evidence.
_U8_WIDEN = jnp.bfloat16


def morphology_pallas(img, radius: int, mode: int):
    """Fused separable erode (mode 0) / dilate (mode 1), replicate border.

    uint8 inputs are widened (see _U8_WIDEN) for the kernel and narrowed
    back — results identical.
    """
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        return _over_batch(
            lambda v: _sep_stencil_strips(
                v.astype(jnp.int32).astype(_U8_WIDEN), radius, None,
                mode == 0, REPLICATE
            ).astype(jnp.int32).astype(jnp.uint8),
            img)
    return _over_batch(
        lambda v: _sep_stencil_strips(v, radius, None, mode == 0, REPLICATE),
        img)


def morph_pallas_ypadded(x, radius: int, mode: int):
    """Fused erode/dilate on a row-padded block (see _sep_stencil_ypadded)."""
    x = jnp.asarray(x)

    def strips(v):
        return column_strips(
            lambda seg, lo, hi: _sep_stencil_ypadded(
                seg, radius, None, mode == 0, REPLICATE, lo=lo, hi=hi),
            v, radius, _MAX_LANES)

    if x.dtype == jnp.uint8:
        return _over_batch(
            lambda v: strips(
                v.astype(jnp.int32).astype(_U8_WIDEN)
            ).astype(jnp.int32).astype(jnp.uint8),
            x)
    return _over_batch(strips, x)
