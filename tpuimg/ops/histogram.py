"""Global histogram equalization + CLAHE.

Reference: Histogram/ — gCalcHistUnroll8 (image_process.cu:33-69, smem atomics),
gCalcHeTable (:72-124, Blelloch CDF + rint LUT), gMapping (:127-136), and the
CLAHE chain gCalcTileHistsUnroll → gClipLimit → gCreateTable →
gInterpolateMappingUnroll (:208-510) driven by Claher::run (clahe.cpp:26-104).

TPU design divergences (SURVEY.md §2.2 "no atomics on TPU", §7 hard parts):
- histograms are VMEM-resident Pallas one-hot contractions (kernels/hist.py;
  no HBM one-hot spill — the XLA einsum form in kernels/onehot.py is the CPU
  fallback) and LUT applications are lane dynamic-gathers (kernels/lut.py) —
  measured ~100x faster than XLA's gather lowering;
- clip/redistribute's serial residual loop (`hist[(i<<8)/residual] += 1`,
  image_process.cu:266) becomes a closed-form per-bin count;
- the bilinear 4-LUT interpolation is decomposed into the ≤ xtiles·ytiles
  static rectangular regions on which the 4 corner LUTs are constant (the
  trunc'd tile coordinates ty1/tx1 depend only on y resp. x), so each region
  is 4 shared-one-hot table evaluations — no per-pixel gather at all.
All rounding matches the CUDA ops: `__float2int_rn` → jnp.rint (half-to-even),
`__float2int_rz` → trunc, float→u8 assignment → truncation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpuimg.core.layout import cdiv
from tpuimg.kernels.onehot import hist256, hist256_tiled, lut_apply, lut_apply4
from tpuimg.core.jit import op_jit


def _on_tpu() -> bool:
    return jax.default_backend() != "cpu"


def _hist_global(img):
    """256-bin histogram: VMEM-resident Pallas kernel on TPU (no HBM one-hot
    spill, kernels/hist.py), XLA one-hot einsum elsewhere."""
    if _on_tpu():
        from tpuimg.kernels.hist import hist256_pallas

        return hist256_pallas(img)
    return hist256(img)


def _hist_groups(flat2d):
    """(G, P) u8 -> (G, 256) per-group histograms; same dispatch."""
    if _on_tpu():
        from tpuimg.kernels.hist import hist256_groups_pallas

        return hist256_groups_pallas(flat2d)
    return hist256_tiled(flat2d)


def _hist_tiles(ext, ytiles: int, xtiles: int, th: int, tw: int):
    """Per-tile histograms of the (ytiles*th, xtiles*tw) extension:
    regroup transpose + the grouped hist kernel.

    A transpose-free variant (pad tiles to aligned blocks with free
    reshapes + fused zero pads, 2D tile grid reading each tile block
    directly) measured SLOWER on v5e — 0.67 vs 0.63 ms total CLAHE at 4K
    8x8: the 64-step small-block grid and per-tile (th_p, tw_p) flatten
    relayouts cost more than the one regroup copy they replace. Keep the
    transpose for oversized tiles.

    Round 4: the usual path is ``hist_tiles_fused`` (kernels/hist.py) — no
    transpose at all; each ytile row band is read once and the xtiles are
    carved with static lane slices inside the hist kernel. An i32-packed
    transpose variant (bitcast 4 cols/lane) was probed and is a wash —
    the XLA i32 transpose is no faster (scripts/probes/clahe_r4_probe)."""
    if _on_tpu():
        from tpuimg.kernels import hist as _h

        thp = cdiv(th, 32) * 32
        twp = cdiv(tw, 128) * 128
        if (thp * xtiles * tw <= _h._FUSED_BAND_BYTES
                and thp * twp <= _h._MAX_GROUP):
            return _h.hist_tiles_fused(ext, ytiles, xtiles, th, tw)
    tiles = ext.reshape(ytiles, th, xtiles, tw).transpose(0, 2, 1, 3)
    return _hist_groups(tiles.reshape(ytiles * xtiles, th * tw))


def bincount256(x, per_leading: bool = False):
    """256-bin histogram(s) of a uint8 array.

    per_leading=False reduces everything; True keeps the leading dim and
    reduces the rest (one histogram per leading index).
    """
    if per_leading:
        return hist256_tiled(x.reshape(x.shape[0], -1))
    return hist256(x)


def apply_lut(table, img):
    """dst = table[img] (gMapping, image_process.cu:127-136)."""
    return lut_apply(table, img)


@op_jit(static_argnames=("impl",))
def hist_equalize(img, impl: str = "auto"):
    """Global HE of a uint8 image: table[v] = rint(min(255, cdf[v]*256/N))
    (gCalcHeTable, image_process.cu:115-123; factor hist_equalization.cpp:58).

    Note: the reference kernel undercounts the last x-block of each row band
    (in-loop ``return`` before the smem flush, image_process.cu:54-58); we
    implement the intended algorithm (matches cv::equalizeHist within 2 gray
    levels; see .claude/skills/verify/SKILL.md).
    """
    from tpuimg.core.validate import check_image, check_impl

    img = jnp.asarray(img)
    # uint8 only: a silent jnp.asarray(img, uint8) would turn a [0,1] float
    # image into near-zeros (round-1 advisor finding)
    check_image(img, "img", dtypes=[jnp.uint8])
    check_impl(impl)
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if img.ndim > 2:
        # per-frame semantics over leading batch dims (one histogram/LUT per
        # image, like the reference's per-call behavior and
        # parallel.hist_equalize_sharded)
        lead = img.shape[:-2]
        per_image = img.shape[-2] * img.shape[-1]
        flat = img.reshape((-1,) + img.shape[-2:])
        if impl == "pallas":
            # frame-shaped grouping: 32-row bands per frame (single-frame
            # regime + cheap row-append pad) — 0.86 vs 1.06 ms at 1080p b16
            # over the flat (B, H*W) form (kernels/hist.py, probe r5b)
            from tpuimg.kernels.hist import hist256_frames_pallas

            hists = hist256_frames_pallas(flat)
        else:
            hists = hist256_tiled(flat.reshape(flat.shape[0], -1))
        cdfs = jnp.cumsum(hists, axis=-1).astype(jnp.float32)
        factor = jnp.float32(256.0 / per_image)
        tables = jnp.rint(
            jnp.minimum(jnp.float32(255.0), cdfs * factor)
        ).astype(jnp.uint8)
        if impl == "pallas":
            # batched per-frame Pallas gather at any batch size (round 4:
            # the former >8-frame fallback was the HBM-spilling one-hot
            # einsum the module docstring warns about)
            from tpuimg.kernels.lut import lut_gather_frames

            out = lut_gather_frames(tables, flat)
        else:
            out = jax.vmap(lut_apply)(tables, flat)
        return out.reshape(lead + img.shape[-2:])
    if impl == "pallas":
        from tpuimg.kernels.hist import hist256_pallas

        hist = hist256_pallas(img)  # VMEM-resident (interpret-mode on CPU)
    else:
        hist = hist256(img)
    cdf = jnp.cumsum(hist).astype(jnp.float32)
    factor = jnp.float32(256.0 / img.size)
    table = jnp.rint(jnp.minimum(jnp.float32(255.0), cdf * factor)).astype(jnp.uint8)
    if impl == "pallas":
        from tpuimg.kernels.lut import lut_gather

        return lut_gather(table, img)
    return lut_apply(table, img)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------


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


def _bilinear_blend(t11, t12, t21, t22, xa, ya):
    """The 4-LUT bilinear lerp (gInterpolateMappingUnroll,
    image_process.cu:462-469). Single source of truth for the blend formula —
    consumed by the local XLA mapping below AND parallel.clahe_sharded, so a
    rounding change can never skew one against the other."""
    xa1 = jnp.float32(1.0) - xa
    ya1 = jnp.float32(1.0) - ya
    return (t11 * xa1 + t12 * xa) * ya1 + (t21 * xa1 + t22 * xa) * ya


def _blend_to_u8(out):
    """float → uchar device assignment: truncate with clamp (the CUDA
    implicit conversion in image_process.cu:469). Shared with clahe_sharded."""
    return jnp.clip(jnp.trunc(out), 0.0, 255.0).astype(jnp.uint8)


def _tile_coord_runs(n: int, tiles: int, tsize: int, pad: int, use_recip: bool):
    """Static per-axis region decomposition of the interpolation coordinates.

    Replicates the device f32 math exactly (y: __fdiv_rn, x: __frcp_rn +
    __fmul_rn, trunc via __float2int_rz — image_process.cu:437,456) in NumPy
    f32 at trace time, then returns runs of constant truncated tile index:
    [(start, stop, t1, t2), ...].
    """
    idx = np.arange(n, dtype=np.float32)
    if use_recip:
        tf = (idx + np.float32(pad)) * (np.float32(1.0) / np.float32(tsize)) - np.float32(0.5)
    else:
        tf = (idx + np.float32(pad)) / np.float32(tsize) - np.float32(0.5)
    t1 = np.trunc(tf).astype(np.int32)
    t2 = np.minimum(t1 + 1, tiles - 1)
    bounds = [0] + list(np.flatnonzero(np.diff(t1)) + 1) + [n]
    return [
        (int(s), int(e), int(t1[s]), int(t2[s]), tf[s:e] - t1[s:e])
        for s, e in zip(bounds[:-1], bounds[1:])
    ]


def _clahe_front(img, clip_limit: float, xtiles: int, ytiles: int):
    """Validated CLAHE front end: per-tile clipped LUTs + mapping geometry.

    Everything up to (and excluding) the bilinear 4-LUT mapping of
    Claher::run (clahe.cpp:26-104): tile geometry, reflect-101 centered
    extension, per-tile histograms, clip+redistribute, and the float LUTs.
    Shared by ``clahe`` and the fully-fused enhance pipeline (which maps
    inside the tail kernel instead of in a separate launch).

    Returns (tables (ytiles*xtiles, 256) f32, th, tw, pad_top, pad_left).
    """
    from tpuimg.core.validate import (
        ShapeError, check_image, check_impl, check_positive, check_radius)

    img = jnp.asarray(img)
    # uint8 only — a silent jnp.asarray(img, uint8) would turn a [0,1] float
    # image into near-zeros (same contract as hist_equalize)
    check_image(img, "img", dtypes=[jnp.uint8])
    # tile counts must be ints >= 1 (0 divides by zero, floats break the
    # shift-based centered-pad math); clip <= 0 would drive the per-tile
    # limit negative and the CDF with it (the reference demo never guards
    # its argv here — we fail typed instead of producing garbage LUTs)
    check_radius(xtiles, name="xtiles")
    check_radius(ytiles, name="ytiles")
    check_positive(clip_limit, "clip_limit")
    if img.ndim != 2:
        raise ShapeError(
            f"clahe operates on a single (H, W) image, got shape "
            f"{tuple(img.shape)}; batch with jax.vmap(tpuimg.clahe)"
        )
    h, w = img.shape[-2], img.shape[-1]
    tw, th = cdiv(w, xtiles), cdiv(h, ytiles)
    pad_left = (tw * xtiles - w) >> 1
    pad_top = (th * ytiles - h) >> 1

    # --- per-tile histograms over the reflect-101 centered extension ---
    # (flip+concat of border slices, not an index gather — TPU gathers are
    # slow; identical to the reflect-101 index map since pads < image dims)
    pad_bot = th * ytiles - h - pad_top
    pad_right = tw * xtiles - w - pad_left
    if max(pad_top, pad_bot) + 1 > h or max(pad_left, pad_right) + 1 > w:
        from tpuimg.core.validate import ParamError

        raise ParamError(
            f"tile grid {xtiles}x{ytiles} needs more reflect padding than the "
            f"{h}x{w} image can provide (reference dLimitSize has the same "
            f"validity bound)"
        )
    ext = jnp.concatenate(
        [jnp.flip(img[1 : pad_top + 1, :], axis=0), img,
         jnp.flip(img[h - 1 - pad_bot : h - 1, :], axis=0)], axis=0)
    ext = jnp.concatenate(
        [jnp.flip(ext[:, 1 : pad_left + 1], axis=1), ext,
         jnp.flip(ext[:, w - 1 - pad_right : w - 1], axis=1)], axis=1)
    hists = _hist_tiles(ext, ytiles, xtiles, th, tw)

    # --- clip limit (clahe.cpp:87) + redistribute ---
    limit = int(tw * th * clip_limit / 256 + 0.5)
    hists = _clip_redistribute(hists, limit)

    # --- float LUTs: cdf * 255/tile_pixels (gCreateTable) ---
    fr = jnp.float32(255.0 / (tw * th))
    tables = jnp.cumsum(hists, axis=-1).astype(jnp.float32) * fr  # (T, 256)
    return tables, th, tw, pad_top, pad_left


def _map_bank(tables, ytiles: int, xtiles: int):
    """Corner-table bank for the single-launch mapping kernels: bank[u, t] =
    (T[u, t], T[min(u+1, ymax), t]) — (ytiles, xtiles, 2, 256) f32."""
    idx = []
    for u in range(ytiles):
        ty2u = min(u + 1, ytiles - 1)
        for t in range(xtiles):
            idx += [u * xtiles + t, ty2u * xtiles + t]
    return tables[jnp.asarray(idx, jnp.int32)].reshape(ytiles, xtiles, 2, 256)


@op_jit(static_argnames=("clip_limit", "xtiles", "ytiles", "impl",
                         "_out_f32"))
def clahe(img, clip_limit: float = 1.0, xtiles: int = 8, ytiles: int = 8,
          impl: str = "auto", _out_f32: bool = False):
    """CLAHE of a uint8 (H, W) image, matching Claher::run exactly
    (defaults from the demo, Histogram/main.cpp:80-82).

    impl="auto": the bilinear mapping runs as the lane-dynamic-gather Pallas
    kernel (kernels/lut.py) on TPU, or the one-hot einsum form on CPU.

    ``_out_f32`` (internal, for pipeline fusion): emit the raw bilinear
    blend in [0, 255] as float32, skipping the final u8 truncation — the
    enhance pipeline feeds the next stage at full precision instead of
    round-tripping through uint8 (truncating the blend reproduces the u8
    output bit-for-bit)."""
    from tpuimg.core.validate import check_impl

    check_impl(impl)
    img = jnp.asarray(img)
    tables, th, tw, pad_top, pad_left = _clahe_front(
        img, clip_limit, xtiles, ytiles)
    h, w = img.shape[-2], img.shape[-1]

    # --- bilinear 4-LUT interpolation, region-decomposed ---
    if impl == "auto":
        impl = "pallas" if jax.default_backend() != "cpu" else "xla"
    yruns = _tile_coord_runs(h, ytiles, th, pad_top, use_recip=False)
    xruns = _tile_coord_runs(w, xtiles, tw, pad_left, use_recip=True)

    if impl == "pallas":
        inv_tw = float(np.float32(1.0) / np.float32(tw))
        xinfo = [(x0, x1, tx1) for x0, x1, tx1, _tx2, _ in xruns]
        # a 32-row grid block spans at most n_cand consecutive ty1 bases
        n_cand = min(ytiles, 31 // max(th, 1) + 2)
        bank_bytes = ytiles * xtiles * 4 * 128 * 4
        if n_cand <= 4 and bank_bytes <= (4 << 20):
            # whole-frame mapping in ONE launch (kernels/lut.py
            # clahe_map_full): the y-run base resolves per grid step via a
            # dynamic sublane slice of the full table bank — kills the
            # per-y-run dispatch + output concat of the band form
            from tpuimg.kernels.lut import clahe_map_full

            bank = _map_bank(tables, ytiles, xtiles)
            return clahe_map_full(
                img, bank, xinfo, pad_top=float(pad_top), th=float(th),
                ytiles=ytiles, pad_left=float(pad_left), inv_tw=inv_tw,
                out_f32=_out_f32,
            )
        if not _out_f32:
            # tiny-tile fallback: one pallas_call per y-run
            # (kernels/lut.py clahe_band_map)
            from tpuimg.kernels.lut import clahe_band_map

            bands = []
            for y0, y1, ty1, ty2, _ in yruns:
                idx = []
                for _x0, _x1, tx1, tx2, _ in xruns:
                    idx += [ty1 * xtiles + tx1, ty1 * xtiles + tx2,
                            ty2 * xtiles + tx1, ty2 * xtiles + tx2]
                bank = tables[jnp.asarray(idx, jnp.int32)].reshape(
                    len(xruns), 4, 256)
                bands.append(clahe_band_map(
                    img[y0:y1], bank, xinfo, y0=float(y0),
                    pad_top=float(pad_top), th=float(th), ty1=float(ty1),
                    pad_left=float(pad_left), inv_tw=inv_tw,
                ))
            return jnp.concatenate(bands, axis=-2)
        # _out_f32 with tiny tiles: fall through to the XLA blend (small
        # frames; keeps the f32 semantics identical across impls)

    bands = []
    for y0, y1, ty1, ty2, ya_np in yruns:
        ya = jnp.asarray(ya_np, jnp.float32)[:, None]
        row_chunks = []
        for x0, x1, tx1, tx2, xa_np in xruns:
            xa = jnp.asarray(xa_np, jnp.float32)[None, :]
            v = img[y0:y1, x0:x1]
            t11, t12, t21, t22 = lut_apply4(
                tables[ty1 * xtiles + tx1],
                tables[ty1 * xtiles + tx2],
                tables[ty2 * xtiles + tx1],
                tables[ty2 * xtiles + tx2],
                v,
            )
            row_chunks.append(_bilinear_blend(t11, t12, t21, t22, xa, ya))
        bands.append(jnp.concatenate(row_chunks, axis=-1))
    blend = jnp.concatenate(bands, axis=-2)
    if _out_f32:
        return blend
    return _blend_to_u8(blend)
