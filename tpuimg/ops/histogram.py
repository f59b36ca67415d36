"""Global histogram equalization + CLAHE.

Reference: Histogram/ — gCalcHistUnroll8 (image_process.cu:33-69, smem atomics),
gCalcHeTable (:72-124, Blelloch CDF + rint LUT), gMapping (:127-136), and the
CLAHE chain gCalcTileHistsUnroll → gClipLimit → gCreateTable →
gInterpolateMappingUnroll (:208-510) driven by Claher::run (clahe.cpp:26-104).

TPU design divergences (SURVEY.md §2.2 "no atomics on TPU"):
- histograms are computed as vectorized compare-reductions (or the Pallas
  tile-bincount kernel), not atomic scatter-adds;
- clip/redistribute's serial residual loop (`hist[(i<<8)/residual] += 1`,
  image_process.cu:266) becomes a closed-form per-bin count;
- LUT application is a 256-entry take / one-hot contraction instead of a
  per-pixel global-memory gather.
All rounding matches the CUDA ops: `__float2int_rn` → jnp.rint (half-to-even),
float→u8 assignment → truncation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuimg.core.layout import cdiv


def bincount256(x, axis=None):
    """256-bin histogram(s) of a uint8/int array by compare-reduction.

    ``x`` may have leading batch/tile dims; the reduction runs over ``axis``
    (default: all dims). Returns int32 counts with bins as the last dim.
    """
    x = x.astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    onehot = (x[..., None] == bins)
    if axis is None:
        axes = tuple(range(x.ndim))
    else:
        axes = axis if isinstance(axis, tuple) else (axis,)
    return jnp.sum(onehot, axis=axes, dtype=jnp.int32)


def apply_lut(table, img):
    """dst = table[img] (gMapping, image_process.cu:127-136)."""
    return jnp.take(table, img.astype(jnp.int32), axis=0)


@functools.partial(jax.jit, static_argnames=("impl",))
def hist_equalize(img, impl: str = "xla"):
    """Global HE of a uint8 image: table[v] = rint(min(255, cdf[v]*256/N))
    (gCalcHeTable, image_process.cu:115-123; factor hist_equalization.cpp:58)."""
    img = jnp.asarray(img, jnp.uint8)
    if impl == "pallas":
        from tpuimg.kernels.hist import bincount256_pallas

        hist = bincount256_pallas(img.reshape(1, *img.shape[-2:]))[0]
    else:
        hist = bincount256(img)
    cdf = jnp.cumsum(hist).astype(jnp.float32)
    factor = jnp.float32(256.0 / img.size)
    table = jnp.rint(jnp.minimum(jnp.float32(255.0), cdf * factor)).astype(jnp.uint8)
    return apply_lut(table, img)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------


def _reflect101(idx, size: int):
    idx = jnp.abs(idx)
    over = idx - (size - 1)
    return idx - 2 * jnp.maximum(over, 0)


def _clip_redistribute(hists, limit: int):
    """Vectorized gClipLimit (image_process.cu:242-268).

    steal = total excess over limit; every bin gets ``steal >> 8``; the
    residual r = steal & 255 lands one count each on bins (i<<8)//r for
    i < r — counted in closed form per bin.
    """
    excess = jnp.maximum(hists - limit, 0)
    steal = jnp.sum(excess, axis=-1, keepdims=True)
    clipped = jnp.minimum(hists, limit)
    bonus = steal >> 8
    residual = steal - (bonus << 8)  # in [0, 255]
    b = jnp.arange(256, dtype=jnp.int32)
    # #{i : (i << 8) // r == b, 0 <= i < r} = max(0, hi - lo + 1)
    lo = -((-b * residual) // 256)
    hi = ((b + 1) * residual - 1) // 256
    extra = jnp.where(residual > 0, jnp.maximum(hi - lo + 1, 0), 0)
    return clipped + bonus + extra


@functools.partial(
    jax.jit, static_argnames=("clip_limit", "xtiles", "ytiles", "impl")
)
def clahe(img, clip_limit: float = 40.0, xtiles: int = 8, ytiles: int = 8,
          impl: str = "xla"):
    """CLAHE of a uint8 (H, W) image, matching Claher::run exactly."""
    img = jnp.asarray(img, jnp.uint8)
    h, w = img.shape[-2], img.shape[-1]
    tw, th = cdiv(w, xtiles), cdiv(h, ytiles)
    pad_left = (tw * xtiles - w) >> 1
    pad_top = (th * ytiles - h) >> 1

    # --- per-tile histograms over the reflect-101 centered extension ---
    ys = _reflect101(jnp.arange(th * ytiles) - pad_top, h)
    xs = _reflect101(jnp.arange(tw * xtiles) - pad_left, w)
    ext = img[..., ys, :][..., :, xs]
    tiles = ext.reshape(ytiles, th, xtiles, tw).transpose(0, 2, 1, 3)
    flat = tiles.reshape(ytiles * xtiles, th * tw)
    if impl == "pallas":
        from tpuimg.kernels.hist import bincount256_pallas

        hists = bincount256_pallas(tiles.reshape(ytiles * xtiles, th, tw))
    else:
        hists = bincount256(flat, axis=1)

    # --- clip limit (clahe.cpp:87) + redistribute ---
    limit = int(tw * th * clip_limit / 256 + 0.5)
    hists = _clip_redistribute(hists, limit)

    # --- float LUTs: cdf * 255/tile_pixels (gCreateTable) ---
    fr = jnp.float32(255.0 / (tw * th))
    tables = jnp.cumsum(hists, axis=-1).astype(jnp.float32) * fr  # (T, 256)

    # --- bilinear 4-LUT interpolation (gInterpolateMappingUnroll :428-471) ---
    iy = jnp.arange(h, dtype=jnp.float32)[:, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, :]
    tyf = (iy + pad_top) / jnp.float32(th) - 0.5
    txf = (ix + pad_left) * jnp.float32(1.0 / tw) - 0.5
    ty1 = tyf.astype(jnp.int32)  # __float2int_rz: trunc toward zero
    tx1 = txf.astype(jnp.int32)
    ty2 = jnp.minimum(ty1 + 1, ytiles - 1)
    tx2 = jnp.minimum(tx1 + 1, xtiles - 1)
    ya = tyf - ty1
    xa = txf - tx1
    ya1 = 1.0 - ya
    xa1 = 1.0 - xa

    v = img.astype(jnp.int32)
    tflat = tables.reshape(-1)
    gather = lambda t_idx: jnp.take(tflat, (t_idx << 8) + v)
    t11 = gather(ty1 * xtiles + tx1)
    t12 = gather(ty1 * xtiles + tx2)
    t21 = gather(ty2 * xtiles + tx1)
    t22 = gather(ty2 * xtiles + tx2)
    out = (t11 * xa1 + t12 * xa) * ya1 + (t21 * xa1 + t22 * xa) * ya
    # float → uchar assignment truncates (with clamp) on the device
    return jnp.clip(jnp.trunc(out), 0.0, 255.0).astype(jnp.uint8)
