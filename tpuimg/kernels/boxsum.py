"""Fused guided-filter kernels (Pallas): the gCalcAB / gWeightByABm analog.

Reference: the fused small-radius guided filter (GuidedFilter/
guided_filter_d.cu:421-858) computes, in one rolling-strip kernel, the four
windowed box means of P, I, I·P, I·I (smem ring planes :426-429) and from them
a, b directly (:552-560); a second kernel box-sums A, B and forms
q = (ΣA·I + ΣB)/ksz² (:788). Border reflect-101, normalization 1/ksz².

TPU redesign: Pallas band kernels sharing the sep_stencil halo-stream
layout. Window sums are log-depth doubling ladders over VMEM blocks (lane
shifts for x, sublane shifts for y); the a/b algebra fuses into the same
pass. The default "onepass" variant pre-pads the frame and keeps A/B out of
HBM entirely (one kernel); see the note above _guided_strip_onepass for why
the pad-based layout beats the fully in-kernel-border form HERE (unlike
sep_stencil, where in-kernel borders win decisively). The sharding layer's
entry point (_guided_onepass_ypadded) uses the in-kernel x borders, since
halo-exchanged shards arrive row-padded but not column-padded.

Wide images run in column strips (≤ 2048 output columns for the 6-stream
general kernel, ≤ 3968 for the 3-stream self-guided one — Mosaic rejects
wider lane blocks).

Measured dead end (v5e, r=8 4K self-guided): offloading the y-direction
window sums to the MXU as banded-ones bf16 matmuls — 0.63 ms with the
hi/lo operand split needed for f32 accuracy (vs 0.59 VPU), and 0.57 ms
unsplit but with 3.5e-3 error, over the 1e-3 contract. The VPU log-depth
ladders (kernels/window.py) stay. A single 4096-lane strip DOES compile
for the 3-stream self-guided variant (bit-exact) but measures identical
to two 2048 strips — keep 2048, which the 6-stream general kernel needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.borders import REFLECT101, pad_mode
from tpuimg.core.jit import op_jit
from tpuimg.core.kernelgen import gaussian_kernel_1d
from tpuimg.core.layout import cdiv, round_up
from tpuimg.kernels import interpret_mode
from tpuimg.kernels.sep_stencil import _x_extend
from tpuimg.kernels.window import window_sum

# Output columns per strip of the 6-stream general kernel. NOTE (round 3):
# at 4K XLA may park the kernel's (hp, wout_l) f32 operands/outputs in VMEM
# and overflow the default 16M scoped-vmem stack (a hard compile error that
# appeared only inside the enhance pipeline); shrinking the strips just
# moved the overflow to a different parked set, so the real fix is the
# raised xla_tpu_scoped_vmem_limit_kib on every op's jit boundary
# (core/jit.py) — strip width stays at its measured-best value.
_MAX_STRIP = 2048
# The 3-stream self-guided kernel compiles at 4K-lane blocks (4096 measured
# round 2); 3968 keeps w_in + halos + tail-absorb under that bound.
_MAX_STRIP_SELF = 3968


# VMEM band budget — small on purpose; see sep_stencil._VMEM_BUDGET for the
# round-2 measurement showing bigger budgets / vmem limits don't help
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_band(h: int, wp: int) -> int:
    """Row band from the VMEM budget: the fused kernel streams 6
    double-buffered inputs + 1 output and holds ~8 live f32 planes."""
    per_row = wp * 4 * 20
    band = _VMEM_BUDGET // per_row
    band = max(8, min(256, (band // 8) * 8))
    return min(band, round_up(h, 8))


def _xsum(t, ksz, wout, start=0):
    # log-depth doubling window sum (kernels/window.py): ~log2(ksz)+popcount
    # adds per pixel instead of ksz-1 — keeps the fused path winning at the
    # reference's full r1-7 ladder and beyond (guided_filter_d.cu:1047-1093)
    return window_sum(t, ksz, wout, axis=1, start=start)


def _ysum(t, ksz, rows):
    return window_sum(t, ksz, rows, axis=0)


def _pad_rows_for_bands(x, r: int, band: int, hb: int, wp: int):
    """reflect-101 y halo + band/lane alignment padding; x is already padded
    (or halo'd) by the caller."""
    h = x.shape[0]
    hp = round_up(h, band)
    x = jnp.pad(x, ((r, r), (0, 0)), mode=pad_mode(REFLECT101))
    return jnp.pad(x, ((band - r, hp - h - r + hb), (0, wp - x.shape[1])),
                   mode="edge")


def _band_specs_padded(band: int, hb: int, wp: int):
    """Halo views over a PRE-PADDED array (the twopass variant keeps the
    reference's A/B-through-HBM structure and its pad-based layout)."""
    bpr = band // hb
    return [
        pl.BlockSpec((hb, wp), lambda i: ((i + 1) * bpr - 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((band, wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, wp), lambda i: ((i + 2) * bpr, 0), memory_space=pltpu.VMEM),
    ]


def _guided_strip(Iseg, pseg, r: int, eps: float):
    """Fused guided filter on one x-halo'd strip.

    ``Iseg``/``pseg`` are (h, w_in) with w_in = w_out + 4r: the outer 2r
    columns on each side are halo (reflect-extended or neighbor data). Output
    is (h, w_out).
    """
    h, w_in = Iseg.shape
    ksz = 2 * r + 1
    coef = 1.0 / (ksz * ksz)
    w_ab = w_in - 2 * r      # A/B are valid on the inner w_in - 2r columns
    w_out = w_in - 4 * r
    wab_l = round_up(w_ab, 128)
    wp = round_up(max(w_in, wab_l + 2 * r), 128)
    hb = round_up(max(r, 1), 8)
    band = round_up(max(_pick_band(h, wp), hb), hb)
    hp = round_up(h, band)

    def concat3(top, cur, bot):
        return jnp.concatenate([top[hb - r :], cur, bot[:r]], axis=0)

    def ab_kernel(It, Ic, Ib, Pt, Pc, Pb, a_ref, b_ref):
        Iv = concat3(It[:], Ic[:], Ib[:])  # (band+2r, wp)
        Pv = concat3(Pt[:], Pc[:], Pb[:])
        imu = _ysum(_xsum(Iv, ksz, wab_l), ksz, band) * coef
        pmu = _ysum(_xsum(Pv, ksz, wab_l), ksz, band) * coef
        ipmu = _ysum(_xsum(Iv * Pv, ksz, wab_l), ksz, band) * coef
        iimu = _ysum(_xsum(Iv * Iv, ksz, wab_l), ksz, band) * coef
        a = (ipmu - pmu * imu) / (iimu - imu * imu + jnp.float32(eps))
        a_ref[:] = a
        b_ref[:] = pmu - a * imu

    Ip = _pad_rows_for_bands(Iseg, r, band, hb, wp)
    Pp = _pad_rows_for_bands(pseg, r, band, hb, wp)
    specs = _band_specs_padded(band, hb, wp)
    A, B = pl.pallas_call(
        ab_kernel,
        grid=(hp // band,),
        in_specs=specs + specs,
        out_specs=[
            pl.BlockSpec((band, wab_l), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((hp, wab_l), jnp.float32)] * 2,
        interpret=interpret_mode(),
    )(Ip, Ip, Ip, Pp, Pp, Pp)

    wout_l = round_up(w_out, 128)
    wp2 = round_up(max(w_ab, wout_l + 2 * r), 128)

    def q_kernel(At, Ac, Ab_, Bt, Bc, Bb, Ic, q_ref):
        Av = concat3(At[:], Ac[:], Ab_[:])
        Bv = concat3(Bt[:], Bc[:], Bb[:])
        asum = _ysum(_xsum(Av, ksz, wout_l), ksz, band)
        bsum = _ysum(_xsum(Bv, ksz, wout_l), ksz, band)
        q_ref[:] = (asum * Ic[:] + bsum) * jnp.float32(coef)

    Ap = _pad_rows_for_bands(A[:h, :w_ab], r, band, hb, wp2)
    Bp = _pad_rows_for_bands(B[:h, :w_ab], r, band, hb, wp2)
    Io = jnp.pad(Iseg[:, 2 * r : 2 * r + w_out],
                 ((0, hp - h), (0, wout_l - w_out)), mode="edge")
    specs2 = _band_specs_padded(band, hb, wp2)
    q = pl.pallas_call(
        q_kernel,
        grid=(hp // band,),
        in_specs=specs2 + specs2
        + [pl.BlockSpec((band, wout_l), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((band, wout_l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wout_l), jnp.float32),
        interpret=interpret_mode(),
    )(Ap, Ap, Ap, Bp, Bp, Bp, Io)
    return q[:h, :w_out]


# Round-3 finding: moving the guided borders fully in-kernel (raw inputs,
# clamped halo views + row fixes, like sep_stencil) measured SLOWER than this
# pad-based kernel at 4K self-guided r8 — 0.72 ms in-kernel vs 0.67 hybrid
# (x-prepad only) vs 0.59 here — and isolation probes showed the row fixes
# and x extension cost ~nothing: the regression is structural (clamped
# index maps / partial last blocks / coarser 4r-halo band geometry), see
# /tmp/probe_iso.log 2026-08-17. The local op therefore keeps this round-2
# kernel; the in-kernel-border machinery lives on in _guided_onepass_ypadded
# (the sharding entry point) and sep_stencil (where it wins decisively).


def _guided_strip_onepass(Iseg, pseg, r: int, eps: float):
    """Single-kernel fused guided filter on one x-halo'd strip.

    Unlike the reference's two kernels (gCalcAB then gWeightByABm, with A and
    B round-tripping through global memory), ONE band kernel reads I and P
    with a 2r-row halo, computes a/b on the band+2r extent (recomputing the
    halo rows' a/b — pure VPU work, zero extra HBM traffic), box-means them,
    and writes q. HBM traffic = 2 reads + 1 write of the strip.

    ``pseg is Iseg`` triggers the self-guided specialization: with P ≡ I the
    four windowed means collapse to two (pmu ≡ imu, ipmu ≡ iimu), dropping
    2 of the 6 window-sum ladders and one input stream — bitwise-identical
    output, the kernel is VPU-op-bound (docs/PERFORMANCE.md).

    ``Iseg``/``pseg`` are (h, w_in) with w_in = w_out + 4r halo columns.
    """
    self_guided = pseg is Iseg
    h, w_in = Iseg.shape
    ksz = 2 * r + 1
    coef = 1.0 / (ksz * ksz)
    w_out = w_in - 4 * r
    wout_l = round_up(w_out, 128)
    wab_l = wout_l + 2 * r          # a/b x-extent (in-kernel slice, any width)
    wp = round_up(wout_l + 4 * r, 128)  # >= w_in and >= wab_l + 2r
    hb = round_up(2 * r, 8)  # row halo: pass A needs r, pass B needs r more
    band = round_up(max(_pick_band(h, wp) * 2, hb), hb)
    hp = round_up(h, band)

    def concat3(top, cur, bot):
        return jnp.concatenate(
            [top[hb - 2 * r :], cur, bot[: 2 * r]], axis=0
        )  # (band + 4r, wp)

    rows_ab = band + 2 * r

    def _finish(Iv, imu, pmu, ipmu, iimu, q_ref):
        a = (ipmu - pmu * imu) / (iimu - imu * imu + jnp.float32(eps))
        b = pmu - a * imu
        asum = _ysum(_xsum(a, ksz, wout_l), ksz, band)
        bsum = _ysum(_xsum(b, ksz, wout_l), ksz, band)
        Icen = Iv[2 * r : 2 * r + band, 2 * r : 2 * r + wout_l]
        q_ref[:] = (asum * Icen + bsum) * jnp.float32(coef)

    def mean(x):
        return _ysum(_xsum(x, ksz, wab_l), ksz, rows_ab) * jnp.float32(coef)

    def kernel(It, Ic_, Ib, Pt, Pc, Pb, q_ref):
        Iv = concat3(It[:], Ic_[:], Ib[:])
        Pv = concat3(Pt[:], Pc[:], Pb[:])
        imu = mean(Iv)
        pmu = mean(Pv)
        ipmu = mean(Iv * Pv)
        iimu = mean(Iv * Iv)
        _finish(Iv, imu, pmu, ipmu, iimu, q_ref)

    def kernel_self(It, Ic_, Ib, q_ref):
        Iv = concat3(It[:], Ic_[:], Ib[:])
        imu = mean(Iv)
        iimu = mean(Iv * Iv)
        _finish(Iv, imu, imu, iimu, iimu, q_ref)

    def pad_rows(x):
        xr = jnp.pad(x, ((2 * r, 2 * r), (0, 0)), mode=pad_mode(REFLECT101))
        return jnp.pad(
            xr, ((band - 2 * r, hp - h - 2 * r + hb), (0, wp - x.shape[1])),
            mode="edge")

    bpr = band // hb
    specs = [
        pl.BlockSpec((hb, wp), lambda i: ((i + 1) * bpr - 1, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((band, wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, wp), lambda i: ((i + 2) * bpr, 0),
                     memory_space=pltpu.VMEM),
    ]
    Ip_ = pad_rows(Iseg)
    if self_guided:
        q = pl.pallas_call(
            kernel_self,
            grid=(hp // band,),
            in_specs=specs,
            out_specs=pl.BlockSpec((band, wout_l), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wout_l), jnp.float32),
            interpret=interpret_mode(),
        )(Ip_, Ip_, Ip_)
        return q[:h, :w_out]
    Pp_ = pad_rows(pseg)
    q = pl.pallas_call(
        kernel,
        grid=(hp // band,),
        in_specs=specs + specs,
        out_specs=pl.BlockSpec((band, wout_l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wout_l), jnp.float32),
        interpret=interpret_mode(),
    )(Ip_, Ip_, Ip_, Pp_, Pp_, Pp_)
    return q[:h, :w_out]




def _tail_chain(Fv, rg: int, w, r: int, eps: float, band: int, wout_l: int):
    """The gaussian+guided math of the fused enhance tail, on one assembled
    f32 view ``Fv`` of (band + 2*(2r+rg), wp >= wout_l + 4r + 2rg) — returns
    the (band, wout_l) q block. Shared by the f32-input tail kernel
    (_enhance_tail_strip) and the CLAHE-fused one (_enhance_tail_clahe_strip);
    op order is identical between them, so swapping the Fv producer cannot
    change the tail arithmetic."""
    ksz = 2 * r + 1
    coef = 1.0 / (ksz * ksz)
    rows_ab = band + 2 * r
    R_old = band + 4 * r             # extent the guided chain consumes
    W_old = wout_l + 4 * r
    wab_l = wout_l + 2 * r
    # smooth = separable gaussian on the (R_old, W_old) extent, offset rg
    acc = w[rg] * Fv[rg : rg + R_old]
    for k in range(1, rg + 1):
        acc = acc + w[rg - k] * (
            Fv[rg - k : rg - k + R_old] + Fv[rg + k : rg + k + R_old])
    Sv = w[rg] * acc[:, rg : rg + W_old]
    for k in range(1, rg + 1):
        Sv = Sv + w[rg - k] * (
            acc[:, rg - k : rg - k + W_old]
            + acc[:, rg + k : rg + k + W_old])
    Iv = Fv[rg : rg + R_old, rg : rg + W_old]

    def mean(x):
        return _ysum(_xsum(x, ksz, wab_l), ksz, rows_ab) * jnp.float32(coef)

    imu = mean(Iv)
    pmu = mean(Sv)
    ipmu = mean(Iv * Sv)
    iimu = mean(Iv * Iv)
    a = (ipmu - pmu * imu) / (iimu - imu * imu + jnp.float32(eps))
    b = pmu - a * imu
    asum = _ysum(_xsum(a, ksz, wout_l), ksz, band)
    bsum = _ysum(_xsum(b, ksz, wout_l), ksz, band)
    Icen = Iv[2 * r : 2 * r + band, 2 * r : 2 * r + wout_l]
    return (asum * Icen + bsum) * jnp.float32(coef)


def _enhance_tail_strip(fseg, rg: int, weights, r: int, eps: float):
    """Fused gaussian+guided band kernel on one x-halo'd strip (round 4).

    The enhance pipeline's tail is ``q = guided(I=f, p=gauss(f))``. Staged,
    that is an XLA gaussian pass (full HBM read+write) plus the general
    6-stream guided kernel reading BOTH f and smooth. Here ONE band kernel
    reads f with a (2r + rg)-deep halo, recomputes smooth = separable
    gaussian in VMEM on the halo extent (the same halo-recompute trick the
    one-pass guided kernel uses for a/b), and runs the full guided chain —
    smooth never exists in HBM at all. Reference precedent for cross-stage
    fusion: the gCalcAB fused chain, GuidedFilter/guided_filter_d.cu:421-858.

    ``fseg`` is (h, w_in) with w_in = w_out + 2*(2r + rg) halo columns.
    """
    h, w_in = fseg.shape
    hb2 = 2 * r + rg                 # total halo depth per side, both axes
    w_out = w_in - 2 * hb2
    wout_l = round_up(w_out, 128)
    wp = round_up(wout_l + 2 * hb2, 128)
    hb = round_up(hb2, 8)
    band = round_up(max(_pick_band(h, wp) * 2, hb), hb)
    hp = round_up(h, band)
    w = [float(v) for v in weights]

    def concat3(top, cur, bot):
        return jnp.concatenate(
            [top[hb - hb2 :], cur, bot[:hb2]], axis=0
        )  # (band + 2*hb2, wp)

    def kernel(Ft, Fc, Fb, q_ref):
        Fv = concat3(Ft[:], Fc[:], Fb[:])
        q_ref[:] = _tail_chain(Fv, rg, w, r, eps, band, wout_l)

    def pad_rows(x):
        xr = jnp.pad(x, ((hb2, hb2), (0, 0)), mode=pad_mode(REFLECT101))
        return jnp.pad(
            xr, ((band - hb2, hp - h - hb2 + hb), (0, wp - x.shape[1])),
            mode="edge")

    bpr = band // hb
    specs = [
        pl.BlockSpec((hb, wp), lambda i: ((i + 1) * bpr - 1, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((band, wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, wp), lambda i: ((i + 2) * bpr, 0),
                     memory_space=pltpu.VMEM),
    ]
    Fp = pad_rows(fseg)
    q = pl.pallas_call(
        kernel,
        grid=(hp // band,),
        in_specs=specs,
        out_specs=pl.BlockSpec((band, wout_l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wout_l), jnp.float32),
        interpret=interpret_mode(),
    )(Fp, Fp, Fp)
    return q[:h, :w_out]


@op_jit(static_argnames=("radius_g", "sigma", "radius", "eps"))
def enhance_tail_pallas(f, radius_g: int, sigma: float, radius: int,
                        eps: float):
    """q = guided_filter(I=f, p=gaussian(f, radius_g, sigma), radius, eps)
    as ONE fused Pallas kernel chain (see _enhance_tail_strip). f is a f32
    (H, W) frame; reflect-101 borders, 1/ksz^2 normalization."""
    f = jnp.asarray(f, jnp.float32)
    h, w = f.shape
    rg = radius_g
    r = radius
    hb2 = 2 * r + rg
    weights = gaussian_kernel_1d(2 * rg + 1, sigma)
    fx = jnp.pad(f, ((0, 0), (hb2, hb2)), mode=pad_mode(REFLECT101))
    outs = []
    for x0 in range(0, w, _MAX_STRIP):
        x1 = min(x0 + _MAX_STRIP, w)
        seg = fx[:, x0 : x1 + 2 * hb2]
        outs.append(_enhance_tail_strip(seg, rg, weights, r, eps))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _enhance_tail_clahe_strip(useg, tabs, rg: int, weights, r: int,
                              eps: float, *, h_frame, w_frame, x0, xinfo,
                              pad_top, th, tw, ytiles, xtiles, pad_left,
                              inv_tw):
    """CLAHE-blend + gaussian + guided on one x-halo'd u8 strip (round 5).

    Round 4 left the CLAHE mapping as the last unfused enhance stage: the
    mapping kernel wrote a full-frame f32 blend that the tail immediately
    re-read (~0.1 ms of pure HBM round-trip at 4K). Here the tail band
    kernel reads the RAW u8 strip (4x less read traffic than the f32 blend)
    plus the (ytiles·xtiles·4, 128) corner-table bank, and recomputes the
    bilinear blend in-kernel on the halo extent with reflect-101 MIRRORED
    coordinates (kernels/lut.py make_blend_band) — the same halo-recompute
    trick already applied to smooth, one stage earlier. Reference precedent:
    the gCalcAB fused chain, GuidedFilter/guided_filter_d.cu:421-858.

    ``useg`` is u8 (h, w_in), w_in = w_out + 2*(2r + rg); ``x0`` the strip's
    first output column in frame coordinates.
    """
    from tpuimg.kernels.lut import make_blend_band

    h, w_in = useg.shape
    hb2 = 2 * r + rg                 # total halo depth per side, both axes
    w_out = w_in - 2 * hb2
    wout_l = round_up(w_out, 128)
    wp = round_up(wout_l + 2 * hb2, 128)
    hb = round_up(hb2, 32)           # u8 blocks: 32-sublane granularity
    band = round_up(max(_pick_band(h, wp) * 2, hb), hb)
    hp = round_up(h, band)
    rows_ext = band + 2 * hb2
    w = [float(v) for v in weights]
    blend_fn, _n_cand = make_blend_band(
        h=h_frame, w=w_frame, x0=x0, hb2=hb2, wp=wp, rows=rows_ext,
        xinfo=xinfo, pad_top=pad_top, th=th, tw=tw, ytiles=ytiles,
        xtiles=xtiles, pad_left=pad_left, inv_tw=inv_tw)

    def concat3(top, cur, bot):
        return jnp.concatenate(
            [top[hb - hb2 :], cur, bot[:hb2]], axis=0
        )  # u8 (band + 2*hb2, wp)

    def kernel(tab_ref, Ut, Uc, Ub, q_ref):
        i = pl.program_id(0)
        Uv = concat3(Ut[:], Uc[:], Ub[:])
        Fv = blend_fn(tab_ref, Uv, i * band - hb2) * jnp.float32(1.0 / 255.0)
        q_ref[:] = _tail_chain(Fv, rg, w, r, eps, band, wout_l)

    def pad_rows(x):
        xr = jnp.pad(x, ((hb2, hb2), (0, 0)), mode=pad_mode(REFLECT101))
        return jnp.pad(
            xr, ((band - hb2, hp - h - hb2 + hb), (0, wp - x.shape[1])),
            mode="edge")

    bpr = band // hb
    specs = [
        pl.BlockSpec((tabs.shape[0], 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, wp), lambda i: ((i + 1) * bpr - 1, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((band, wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, wp), lambda i: ((i + 2) * bpr, 0),
                     memory_space=pltpu.VMEM),
    ]
    Up = pad_rows(useg)
    q = pl.pallas_call(
        kernel,
        grid=(hp // band,),
        in_specs=specs,
        out_specs=pl.BlockSpec((band, wout_l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wout_l), jnp.float32),
        interpret=interpret_mode(),
    )(tabs, Up, Up, Up)
    return q[:h, :w_out]


@op_jit(static_argnames=("radius_g", "sigma", "radius", "eps", "pad_top",
                         "th", "tw", "ytiles", "xtiles", "pad_left",
                         "inv_tw", "xinfo"))
def enhance_tail_clahe_pallas(img, bank, radius_g: int, sigma: float,
                              radius: int, eps: float, *, pad_top, th, tw,
                              ytiles, xtiles, pad_left, inv_tw, xinfo):
    """q = guided(I=f, p=gaussian(f)) with f = clahe_blend(img)/255, the
    blend recomputed INSIDE the tail kernel (see _enhance_tail_clahe_strip).
    ``img`` u8 (H, W); ``bank`` the (ytiles, xtiles, 2, 256) f32 corner-table
    bank (ops/histogram.py _map_bank); ``xinfo`` the static x-run tuple
    ((x_start, x_end, tx1), ...). Returns f32 (H, W)."""
    img = jnp.asarray(img)
    h, w = img.shape
    rg, r = radius_g, radius
    hb2 = 2 * r + rg
    weights = gaussian_kernel_1d(2 * rg + 1, sigma)
    stride = xtiles * 4
    tabs = bank.astype(jnp.float32).reshape(ytiles * stride, 128)
    # f32 block sublane alignment for tiny tile grids (stride not mult. of 8)
    tabs = jnp.pad(tabs, ((0, round_up(tabs.shape[0], 8) - tabs.shape[0]),
                          (0, 0)))
    ux = jnp.pad(img, ((0, 0), (hb2, hb2)), mode=pad_mode(REFLECT101))
    outs = []
    for x0 in range(0, w, _MAX_STRIP):
        x1 = min(x0 + _MAX_STRIP, w)
        seg = ux[:, x0 : x1 + 2 * hb2]
        outs.append(_enhance_tail_clahe_strip(
            seg, tabs, rg, weights, r, eps, h_frame=h, w_frame=w, x0=x0,
            xinfo=list(xinfo), pad_top=pad_top, th=th, tw=tw, ytiles=ytiles,
            xtiles=xtiles, pad_left=pad_left, inv_tw=inv_tw))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _guided_onepass_ypadded(X, P, r: int, eps: float, self_guided: bool,
                            lo: int = 0, hi: int = 0):
    """One-pass guided filter on a block whose row axis is ALREADY padded by
    2r rows per side (halo rows from a neighbor shard or the border policy).
    x borders are built in-kernel. Entry point for
    parallel.guided_filter_sharded — each shard runs the fused chain
    (GuidedFilter/guided_filter_d.cu:421-858) instead of the XLA fallback.
    """
    hin, w_in = X.shape
    h = hin - 4 * r
    w = w_in - lo - hi
    if h < 1:
        raise ValueError(f"ypadded block must have > 4*radius rows; got {hin}")
    ksz = 2 * r + 1
    coef = 1.0 / (ksz * ksz)
    wout_l = round_up(w, 128)
    wab_l = wout_l + 2 * r
    wb = round_up(w_in, 128)
    hb = round_up(4 * r, 8)
    band = round_up(max(_pick_band(h, wb) * 2, hb), hb)
    band = min(band, round_up(h, hb))
    nb = cdiv(h, band)
    nbh = cdiv(hin, hb)
    rows_ab = band + 2 * r

    OFF = lo if lo > 0 else round_up(2 * r, 128)  # ext lane of column 0

    def mean(x):
        return _ysum(_xsum(x, ksz, wab_l, start=OFF - 2 * r), ksz,
                     rows_ab) * jnp.float32(coef)

    def assemble(cur, bot):
        t = jnp.concatenate([cur[:], bot[: 4 * r]], axis=0)  # (band+4r, W)
        return _x_extend(t, 2 * r, w_in, wout_l, True, lo, hi)[0]

    def _finish(Iv, imu, pmu, ipmu, iimu, q_ref):
        a = (ipmu - pmu * imu) / (iimu - imu * imu + jnp.float32(eps))
        b = pmu - a * imu
        asum = _ysum(_xsum(a, ksz, wout_l), ksz, band)
        bsum = _ysum(_xsum(b, ksz, wout_l), ksz, band)
        Icen = Iv[2 * r : 2 * r + band, OFF : OFF + wout_l]
        q_ref[:] = (asum * Icen + bsum) * jnp.float32(coef)

    def kernel(Ic, Ib2, Pc, Pb2, q_ref):
        Iv = assemble(Ic, Ib2)
        Pv = assemble(Pc, Pb2)
        imu = mean(Iv)
        pmu = mean(Pv)
        _finish(Iv, imu, pmu, mean(Iv * Pv), mean(Iv * Iv), q_ref)

    def kernel_self(Ic, Ib2, q_ref):
        Iv = assemble(Ic, Ib2)
        imu = mean(Iv)
        _finish(Iv, imu, imu, mean(Iv * Iv), mean(Iv * Iv), q_ref)

    specs = [
        pl.BlockSpec((band, wb), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, wb),
                     lambda i: (jnp.minimum((i + 1) * (band // hb), nbh - 1),
                                0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((band, wout_l), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((h, w), jnp.float32)
    if self_guided:
        return pl.pallas_call(
            kernel_self, grid=(nb,), in_specs=specs, out_specs=out_spec,
            out_shape=out_shape, interpret=interpret_mode(),
        )(X, X)
    return pl.pallas_call(
        kernel, grid=(nb,), in_specs=specs + specs, out_specs=out_spec,
        out_shape=out_shape, interpret=interpret_mode(),
    )(X, X, P, P)


def guided_pallas_ypadded(I, p, radius: int, eps: float,
                          self_guided: bool = False):
    """Fused guided filter on row-padded blocks (see _guided_onepass_ypadded).
    Leading batch dims unroll like guided_filter_pallas."""
    I = jnp.asarray(I, jnp.float32)
    if I.ndim != 2:
        if I.ndim == 3 and I.shape[0] <= 8:
            return jnp.stack([
                guided_pallas_ypadded(I[i], None if self_guided else p[i],
                                      radius, eps, self_guided)
                for i in range(I.shape[0])])
        return jax.vmap(
            lambda a, b: guided_pallas_ypadded(a, b, radius, eps, self_guided)
        )(I, I if self_guided else p)
    P = I if self_guided else jnp.asarray(p, jnp.float32)
    from tpuimg.kernels.sep_stencil import column_strips

    limit = _MAX_STRIP_SELF if self_guided else _MAX_STRIP + 4 * radius
    if self_guided:
        return column_strips(
            lambda seg, lo, hi: _guided_onepass_ypadded(
                seg, seg, radius, eps, True, lo, hi), I, 2 * radius, limit)
    # non-self: column_strips slices I and P identically per strip
    return column_strips(
        lambda Iseg, Pseg, lo, hi: _guided_onepass_ypadded(
            Iseg, Pseg, radius, eps, False, lo, hi),
        (I, P), 2 * radius, limit)


@op_jit(static_argnames=("radius", "eps", "variant", "self_guided"))
def guided_filter_pallas(I, p, radius: int, eps: float,
                         variant: str = "onepass",
                         self_guided: bool = False):
    """Fused guided filter, reflect-101 border, 1/ksz² normalization
    (the reference hGuidedFilter fast path, guided_filter_d.cu:1047-1093).

    variant="onepass" (default): single kernel, a/b recomputed in the row
    halo — 2 reads + 1 write of HBM total. "twopass": the reference's
    gCalcAB/gWeightByABm split with A, B round-tripping through HBM.

    self_guided=True (a static flag — callers detect p-is-I outside the jit
    boundary) runs the P ≡ I specialization of the one-pass kernel.
    """
    if I.ndim != 2:
        if I.ndim == 3 and I.shape[0] <= 8:  # unroll beats vmap (sep_stencil)
            return jnp.stack([
                guided_filter_pallas(I[i], p[i], radius, eps, variant,
                                     self_guided)
                for i in range(I.shape[0])
            ])
        return jax.vmap(
            lambda a, b: guided_filter_pallas(a, b, radius, eps, variant,
                                              self_guided)
        )(I, p)
    I = jnp.asarray(I, jnp.float32)
    p = I if self_guided else jnp.asarray(p, jnp.float32)
    h, w = I.shape
    r = radius
    strip_fn = _guided_strip_onepass if variant == "onepass" else _guided_strip
    # x halo once, at 2r depth (pass A consumes r, pass B consumes r more)
    Ix = jnp.pad(I, ((0, 0), (2 * r, 2 * r)), mode=pad_mode(REFLECT101))
    px = Ix if self_guided else jnp.pad(
        p, ((0, 0), (2 * r, 2 * r)), mode=pad_mode(REFLECT101))
    step = _MAX_STRIP_SELF if (self_guided and variant == "onepass") \
        else _MAX_STRIP
    outs = []
    for x0 in range(0, w, step):
        x1 = min(x0 + step, w)
        seg = slice(x0, x1 + 4 * r)  # in padded coords: [x0, x1 + 4r)
        Iseg = Ix[:, seg]
        pseg = Iseg if self_guided else px[:, seg]
        outs.append(strip_fn(Iseg, pseg, r, eps))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
