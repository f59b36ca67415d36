"""Pallas 256-bin histogram kernels: VMEM-resident one-hot contraction.

Reference: gCalcHistUnroll8 (Histogram/image_process.cu:33-69) — smem-
privatized atomicAdd histograms, the reference's most-tuned kernel family —
and gCalcTileHistsUnroll (:208-239) for CLAHE per-tile histograms.

TPU redesign: no atomics exist, so counting is a one-hot contraction
(hist[16a+b] = Σ_p [hi_p==a][lo_p==b], kernels/onehot.py). Round 1 ran that
as an XLA einsum, which materializes ~32 B/pixel of one-hot intermediates in
HBM (~265 MB per 4K frame — 5% of peak bandwidth for HE). This kernel builds
the one-hot factors *inside* the kernel in transposed (16, N) layout — pixels
on lanes, nibble bins on sublanes, so the compare ops run at full VPU width —
and contracts them on the MXU into a per-group (16, 16) int-exact count
block. HBM traffic: the u8 pixels once in, 1 KB of counts per group out.

Exactness: one-hot factors are 0/1 (bf16-exact); each group holds < 2^24
pixels so f32 MXU accumulation is exact; cross-group summation is int32.

One kernel body serves both consumers:
- ``hist256_pallas(img)``      — global histogram (HE front end)
- ``hist256_groups_pallas(x)`` — one histogram per leading group (CLAHE
  tiles, batched per-frame HE)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.layout import round_up
from tpuimg.kernels import interpret_mode

_ROWS = 32  # u8 sublane granularity; each grid step counts one (32, W) group
_MAX_GROUP = 1 << 23  # pixels per kernel-call group (f32-exact count bound)
# Row-group sweep (4K, kernel alone): 32 -> 0.207 ms, 120 -> 0.192, 135
# WORSE at 0.221, 216 ties 120. But inside the full hist_equalize the
# 120-row variant measures ~2% SLOWER (0.262 vs 0.256 A/B in one process)
# — the kernel-only gain is overlap the LUT pass already hides. Keep 32.


def _count16x16(hi, lo):
    """(1, n) nibble planes -> (16, 16) f32 exact counts via one-hot MXU
    contraction: part[a, b] = #{p : hi_p == a and lo_p == b}."""
    n = hi.shape[1]
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    ohh = (jnp.broadcast_to(hi, (16, n)) == bins).astype(jnp.bfloat16)
    ohl = (jnp.broadcast_to(lo, (16, n)) == bins).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        ohh, ohl, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _emit_counts(o_ref, part):
    o_ref[0] = jnp.concatenate(
        [part, jnp.zeros((16, 112), jnp.float32)], axis=1
    ).astype(jnp.int32)


def _hist_group_kernel(x_ref, o_ref):
    x = x_ref[0].astype(jnp.int32)  # (32, W)
    rows, w = x.shape
    n = rows * w
    # row-major flatten is vreg-granular (W is a multiple of 128)
    hi = (x >> 4).reshape(1, n)
    lo = (x & 15).reshape(1, n)
    _emit_counts(o_ref, _count16x16(hi, lo))


def _hist_group_kernel_packed(x_ref, o_ref):
    """Same contraction over i32 words holding 4 consecutive u8 pixels.

    Callers that must transpose/regroup pixels first (CLAHE tile regroup)
    do it in i32 — u8 relayouts move a byte per cycle-ish, packed words 4x
    that — and this kernel unpacks in-register: per byte position one
    shift/mask pair, then the identical nibble contraction, summed in f32
    (exact: each part is an exact count, total < 2^24)."""
    x = x_ref[0]  # (32, W4) int32
    rows, w4 = x.shape
    n = rows * w4
    flat = x.reshape(1, n)
    part = None
    for k in range(4):
        b = (flat >> (8 * k)) & 255
        p = _count16x16(b >> 4, b & 15)
        part = p if part is None else part + p
    _emit_counts(o_ref, part)


def _run_groups(xg, packed: bool = False):
    """xg (G, 32, W) u8 — or (G, 32, W4) i32 of 4-packed pixels when
    ``packed`` — -> (G, 256) int32 counts (zero-padding counted in bin 0;
    callers correct for it)."""
    g, rows, w = xg.shape
    out = pl.pallas_call(
        _hist_group_kernel_packed if packed else _hist_group_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, rows, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 16, 128), jnp.int32),
        interpret=interpret_mode(),
    )(xg)
    return out[:, :, :16].reshape(g, 256)


@functools.partial(jax.jit, static_argnames=())
def hist256_pallas(img):
    """Global 256-bin histogram of a u8 (H, W) image, int32, exact."""
    h, w = img.shape
    hp, wp = round_up(h, _ROWS), round_up(w, 128)
    x = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    hists = _run_groups(x.reshape(hp // _ROWS, _ROWS, wp))
    hist = jnp.sum(hists, axis=0)
    return hist.at[0].add(h * w - hp * wp)  # undo the zero padding


@functools.partial(jax.jit, static_argnames=())
def hist256_groups_pallas(x):
    """Per-group histograms: u8 (G, P) -> (G, 256) int32, exact.

    Each row (group) is one histogram domain — a CLAHE tile's pixels
    (flattened) or one frame of a batch. Groups holding >= 2^23 pixels are
    split into subgroups and summed in int32, so f32 MXU accumulation stays
    exact for any frame size (an 8K frame is 33 MPix > 2^24)."""
    g, p = x.shape
    # subgroups keep per-kernel-call counts < 2^23 (2x margin under the f32
    # exact-integer bound of 2^24)
    k = max(1, -(-p // _MAX_GROUP))
    pp = round_up(p, k * _ROWS * 128)
    x = jnp.pad(x, ((0, 0), (0, pp - p)))
    hists = _run_groups(x.reshape(g * k, _ROWS, pp // k // _ROWS))
    hists = jnp.sum(hists.reshape(g, k, 256), axis=1)
    return hists.at[:, 0].add(p - pp)  # undo the zero padding


@functools.partial(jax.jit, static_argnames=())
def hist256_frames_pallas(frames):
    """Per-frame histograms of a u8 (B, H, W) stack -> (B, 256) int32, exact.

    The frame-shaped form of ``hist256_groups_pallas``: each frame is carved
    into 32-row bands (the single-frame regime) instead of one flat
    multi-MPix lane group. Two measured wins at 1080p b16 (probe
    he_batch_r5b, 2026-08-19): the alignment pad is a row append on the
    frame axis (0.082 ms) instead of a strided inner-dim relayout
    (0.180 ms), and the (32, wp) contraction blocks run at the single-frame
    rate — 0.861 vs 1.060 ms for the flat-groups form (38.5 vs 31.3
    GPix/s). Per-band counts are < 2^23 px for any wp < 256K, so the f32
    MXU accumulation stays exact with no subgroup split."""
    b, h, w = frames.shape
    hp, wp = round_up(h, _ROWS), round_up(w, 128)
    x = jnp.pad(frames, ((0, 0), (0, hp - h), (0, wp - w)))
    nb = hp // _ROWS
    hists = _run_groups(x.reshape(b * nb, _ROWS, wp))
    hists = jnp.sum(hists.reshape(b, nb, 256), axis=1)
    return hists.at[:, 0].add(h * w - hp * wp)  # undo the zero padding


@functools.partial(jax.jit, static_argnames=())
def hist256_groups_pallas_packed(x):
    """Per-group histograms of 4-packed pixels: i32 (G, P4) -> (G, 256).

    Each i32 word holds 4 consecutive u8 pixels (little-endian bitcast).
    Probed for the CLAHE tile regroup (transpose in i32, 4x fewer relayout
    elements): measured a WASH on v5e — 0.407 vs 0.364 ms for the u8
    transpose at 4K 8x8 (the XLA i32 transpose is no faster and the
    in-kernel byte extracts add ~2 ops/px; scripts/probes/clahe_r4_probe).
    Kept for callers that already hold packed words; the CLAHE path uses
    hist_tiles_fused below instead."""
    g, p4 = x.shape
    k = max(1, -(-p4 // (_MAX_GROUP // 4)))
    pp4 = round_up(p4, k * _ROWS * 128)
    x = jnp.pad(x, ((0, 0), (0, pp4 - p4)))
    hists = _run_groups(x.reshape(g * k, _ROWS, pp4 // k // _ROWS),
                        packed=True)
    hists = jnp.sum(hists.reshape(g, k, 256), axis=1)
    return hists.at[:, 0].add(4 * (p4 - pp4))  # zero words pad bin 0 by 4


# VMEM cap for one (thp, wp) u8 row band + its (xtiles, 16, 128) output in
# the fused-regroup kernel; above it the transpose path takes over
_FUSED_BAND_BYTES = 6 * 1024 * 1024


def _tile_hist_kernel_factory(xtiles: int, th: int, tw: int, thp: int,
                              twp: int):
    def kernel(x_ref, o_ref):
        x = x_ref[0]  # (thp, wp) u8; rows th..thp are zero padding
        for j in range(xtiles):
            tile = x[:, j * tw : j * tw + tw].astype(jnp.int32)
            tile = jnp.concatenate(
                [tile, jnp.zeros((thp, twp - tw), jnp.int32)], axis=1
            ) if twp > tw else tile
            n = thp * twp
            # twp is a multiple of 128, so this flatten is vreg-granular
            hi = (tile >> 4).reshape(1, n)
            lo = (tile & 15).reshape(1, n)
            o_ref[0, j] = jnp.concatenate(
                [_count16x16(hi, lo), jnp.zeros((16, 112), jnp.float32)],
                axis=1).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("ytiles", "xtiles", "th", "tw"))
def hist_tiles_fused(ext, ytiles: int, xtiles: int, th: int, tw: int):
    """CLAHE per-tile histograms WITHOUT the regroup transpose (round 4).

    One grid step per ytile row band; each xtile is carved in-kernel with a
    static (misaligned) lane slice, lane-padded to a 128 multiple so the
    flatten into the one-hot contraction stays vreg-granular, and counted
    with the same 16x16 MXU contraction. The tile rows are pre-padded to a
    sublane multiple with zeros (one cheap XLA pad) — all padding lands in
    bin 0 by exactly (thp*twp - th*tw) counts per tile and is subtracted.

    Replaces: u8 regroup transpose (0.127 ms at 4K) + grouped-hist kernel.
    Caller guarantees ext is exactly (ytiles*th, xtiles*tw)."""
    thp, twp = round_up(th, _ROWS), round_up(tw, 128)
    w = xtiles * tw
    wp = round_up(w, 128)
    x = ext.reshape(ytiles, th, w)
    x = jnp.pad(x, ((0, 0), (0, thp - th), (0, wp - w)))
    kernel = _tile_hist_kernel_factory(xtiles, th, tw, thp, twp)
    out = pl.pallas_call(
        kernel,
        grid=(ytiles,),
        in_specs=[pl.BlockSpec((1, thp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, xtiles, 16, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ytiles, xtiles, 16, 128), jnp.int32),
        interpret=interpret_mode(),
    )(x)
    hists = out[:, :, :, :16].reshape(ytiles * xtiles, 256)
    return hists.at[:, 0].add(th * tw - thp * twp)
