"""Fused guided-filter kernels (Pallas): the gCalcAB / gWeightByABm analog.

Reference: the fused small-radius guided filter (GuidedFilter/
guided_filter_d.cu:421-858) computes, in one rolling-strip kernel, the four
windowed box means of P, I, I·P, I·I (smem ring planes :426-429) and from them
a, b directly (:552-560); a second kernel box-sums A, B and forms
q = (ΣA·I + ΣB)/ksz² (:788). Border reflect-101, normalization 1/ksz².

TPU redesign: two Pallas band kernels sharing the sep_stencil halo-stream
layout. Window sums are unrolled shifted adds over VMEM blocks (lane shifts
for x, sublane shifts for y); the a/b algebra fuses into the same pass, so
pass A is one read of (I, P) and one write of (A, B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.borders import REFLECT101, pad_mode
from tpuimg.core.layout import round_up
from tpuimg.kernels import interpret_mode

_BAND = 64  # smaller than sep_stencil: pass A holds 4 windowed planes in VMEM


def _xsum(t, ksz, wout):
    acc = t[:, 0:wout]
    for k in range(1, ksz):
        acc = acc + t[:, k : k + wout]
    return acc


def _ysum(t, ksz, rows):
    acc = t[0:rows]
    for k in range(1, ksz):
        acc = acc + t[k : k + rows]
    return acc


def _pad_for_bands(x, r: int, band: int, hb: int, wp: int):
    """reflect-101 halo + band-alignment padding (see sep_stencil layout)."""
    h, w = x.shape
    hp = round_up(h, band)
    x = jnp.pad(x, ((r, r), (r, r)), mode=pad_mode(REFLECT101))
    return jnp.pad(x, ((band - r, hp - h - r + hb), (0, wp - w - 2 * r)), mode="edge")


def _band_specs(band: int, hb: int, wp: int):
    bpr = band // hb
    return [
        pl.BlockSpec((hb, wp), lambda i: ((i + 1) * bpr - 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((band, wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, wp), lambda i: ((i + 2) * bpr, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("radius", "eps"))
def guided_filter_pallas(I, p, radius: int, eps: float):
    """Fused guided filter, reflect-101 border, 1/ksz² normalization
    (the reference hGuidedFilter fast path, guided_filter_d.cu:1047-1093)."""
    if I.ndim != 2:
        return jax.vmap(lambda a, b: guided_filter_pallas(a, b, radius, eps))(I, p)
    I = jnp.asarray(I, jnp.float32)
    p = jnp.asarray(p, jnp.float32)
    h, w = I.shape
    r = radius
    ksz = 2 * r + 1
    coef = 1.0 / (ksz * ksz)
    band = min(_BAND, round_up(h, 8))
    hb = round_up(max(r, 1), 8)
    wout = round_up(w, 128)
    wp = round_up(wout + 2 * r, 128)
    hp = round_up(h, band)

    def concat3(top, cur, bot):
        return jnp.concatenate([top[hb - r :], cur, bot[:r]], axis=0)

    def ab_kernel(It, Ic, Ib, Pt, Pc, Pb, a_ref, b_ref):
        Iv = concat3(It[:], Ic[:], Ib[:])  # (band+2r, wp)
        Pv = concat3(Pt[:], Pc[:], Pb[:])
        imu = _ysum(_xsum(Iv, ksz, wout), ksz, band) * coef
        pmu = _ysum(_xsum(Pv, ksz, wout), ksz, band) * coef
        ipmu = _ysum(_xsum(Iv * Pv, ksz, wout), ksz, band) * coef
        iimu = _ysum(_xsum(Iv * Iv, ksz, wout), ksz, band) * coef
        a = (ipmu - pmu * imu) / (iimu - imu * imu + jnp.float32(eps))
        a_ref[:] = a
        b_ref[:] = pmu - a * imu

    Ip = _pad_for_bands(I, r, band, hb, wp)
    Pp = _pad_for_bands(p, r, band, hb, wp)
    specs = _band_specs(band, hb, wp)
    A, B = pl.pallas_call(
        ab_kernel,
        grid=(hp // band,),
        in_specs=specs + specs,
        out_specs=[
            pl.BlockSpec((band, wout), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((hp, wout), jnp.float32)] * 2,
        interpret=interpret_mode(),
    )(Ip, Ip, Ip, Pp, Pp, Pp)

    def q_kernel(At, Ac, Ab, Bt, Bc, Bb, Ic, q_ref):
        Av = concat3(At[:], Ac[:], Ab[:])
        Bv = concat3(Bt[:], Bc[:], Bb[:])
        asum = _ysum(_xsum(Av, ksz, wout), ksz, band)
        bsum = _ysum(_xsum(Bv, ksz, wout), ksz, band)
        q_ref[:] = (asum * Ic[:] + bsum) * jnp.float32(coef)

    Ap = _pad_for_bands(A[:h, :w], r, band, hb, wp)
    Bp = _pad_for_bands(B[:h, :w], r, band, hb, wp)
    Io = jnp.pad(I, ((0, hp - h), (0, wout - w)), mode="edge")
    q = pl.pallas_call(
        q_kernel,
        grid=(hp // band,),
        in_specs=specs + specs
        + [pl.BlockSpec((band, wout), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((band, wout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wout), jnp.float32),
        interpret=interpret_mode(),
    )(Ap, Ap, Ap, Bp, Bp, Bp, Io)
    return q[:h, :w]
