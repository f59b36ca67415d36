"""Tiny-shape / extreme-parameter domain tests.

The validators admit any h,w >= 1 (core/validate.py:38-40) while the
randomized fuzz suite draws shapes >= 16 px — this locks the band below it.
Full sweep evidence: scripts/probes/edge_domain_probe.py (727 cases over
sizes {1,2,3,5,8,9,15}^2, radii up to max(h,w), constant/extreme content:
0 crashes, 0 mismatches, 13 typed errors on genuinely invalid CLAHE grids).
Reference analog: the CUDA demos never run below real-image sizes; the
autoTestDemo floor is 64 px (Integral/main.cpp:193-194) — this suite goes
below both.
"""

from __future__ import annotations

import numpy as np
import pytest

import tpuimg
from tpuimg.core.validate import TpuImgError
from tpuimg.oracle import (
    dilate_ref,
    erode_ref,
    gaussian_ref,
    guided_filter_ref,
    hist_equalize_ref,
    integral_ref,
)

SIZES = [(1, 1), (1, 9), (9, 1), (2, 3), (3, 15), (8, 8)]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("h,w", SIZES)
def test_integral_tiny(rng, h, w):
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(np.asarray(tpuimg.integral(img)), integral_ref(img))


@pytest.mark.parametrize("h,w", SIZES)
def test_hist_equalize_tiny(rng, h, w):
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(
        np.asarray(tpuimg.hist_equalize(img)), hist_equalize_ref(img)
    )


@pytest.mark.parametrize("h,w", SIZES)
def test_morphology_tiny_and_oversized_radius(rng, h, w):
    """Radius >= image size: replicate border makes the window cover the
    whole frame -> global min/max everywhere."""
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    r = max(h, w)
    assert np.array_equal(np.asarray(tpuimg.erode(img, r)), erode_ref(img, r))
    assert np.array_equal(np.asarray(tpuimg.dilate(img, 1)), dilate_ref(img, 1))


@pytest.mark.parametrize("h,w", SIZES)
def test_gaussian_tiny(rng, h, w):
    img = rng.random((h, w), dtype=np.float32)
    got = np.asarray(tpuimg.gaussian(img, 2, 1.0))
    assert np.max(np.abs(got - gaussian_ref(img, 2, 1.0))) <= 1e-5


@pytest.mark.parametrize("h,w", [(2, 3), (3, 15), (8, 8)])
def test_guided_tiny(rng, h, w):
    I = rng.random((h, w), dtype=np.float32)
    got = np.asarray(tpuimg.guided_filter(I, I, 2, 1e-3))
    assert np.max(np.abs(got - guided_filter_ref(I, I, 2, 1e-3))) <= 1e-4


def test_constant_content():
    """Degenerate content: constant frames (HE of a single gray level,
    guided filter with zero variance + eps)."""
    img = np.full((24, 40), 255, np.uint8)
    assert np.array_equal(
        np.asarray(tpuimg.hist_equalize(img)), hist_equalize_ref(img)
    )
    z = np.zeros((24, 40), np.uint8)
    assert np.array_equal(np.asarray(tpuimg.hist_equalize(z)),
                          hist_equalize_ref(z))
    f = np.full((24, 40), 0.5, np.float32)
    got = np.asarray(tpuimg.guided_filter(f, f, 2, 1e-3))
    assert np.max(np.abs(got - guided_filter_ref(f, f, 2, 1e-3))) <= 1e-4


def test_gaussian_dtype_contract(rng):
    """uint8 is accepted and promoted (blur of the raw 0..255 values,
    float32 out, both impl paths); non-image dtypes raise DTypeError
    instead of being silently blurred."""
    u8 = rng.integers(0, 256, (12, 20), dtype=np.uint8)
    got = np.asarray(tpuimg.gaussian(u8, 2, 1.0))
    assert got.dtype == np.float32
    ref = gaussian_ref(u8.astype(np.float32), 2, 1.0)
    assert np.max(np.abs(got - ref)) <= 1e-3  # 0..255-scale values
    for bad in (np.zeros((8, 8), bool), np.zeros((8, 8), np.int32)):
        with pytest.raises(TpuImgError):
            tpuimg.gaussian(bad, 2, 1.0)


def test_noncontiguous_input(rng):
    """Fortran-order and strided numpy views produce the same results as
    their contiguous copies (jax normalizes layout on transfer)."""
    base = rng.integers(0, 256, (60, 90), dtype=np.uint8)
    views = [np.asfortranarray(base[:31, :45]), base[::2, ::3]]
    for v in views:
        c = np.ascontiguousarray(v)
        assert np.array_equal(np.asarray(tpuimg.integral(v)), integral_ref(c))
        assert np.array_equal(np.asarray(tpuimg.erode(v, 2)), erode_ref(c, 2))


def test_nan_propagates_locally():
    """NaN input stays NaN in the blur (no silent scrubbing); finite
    pixels outside the kernel footprint stay finite."""
    x = np.full((16, 16), 0.25, np.float32)
    x[3, 4] = np.nan
    g = np.asarray(tpuimg.gaussian(x, 1, 1.0))
    assert np.isnan(g[3, 4])
    assert np.isfinite(g[10:, 10:]).all()


def test_clahe_tiny_grid_raises_typed():
    """Grids the reflect bound cannot pad raise ParamError, never crash
    (matches the reference's dLimitSize validity bound)."""
    img = np.zeros((3, 3), np.uint8)
    with pytest.raises(TpuImgError):
        tpuimg.clahe(img, 4.0, 8, 8)


def test_clahe_param_contract(rng):
    """Degenerate tile counts / clip limits raise typed errors (xtiles=0
    used to ZeroDivisionError, clip<=0 silently drove the per-tile limit
    negative); 1-tile grids are valid and match the oracle."""
    from tpuimg.oracle import clahe_ref

    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    for bad in [dict(xtiles=0), dict(ytiles=0), dict(xtiles=1.5),
                dict(clip_limit=0.0), dict(clip_limit=-2.0)]:
        kw = dict(clip_limit=4.0, xtiles=2, ytiles=2) | bad
        with pytest.raises(TpuImgError):
            tpuimg.clahe(img, **kw)
    for xt, yt in [(1, 1), (1, 4), (4, 1)]:
        got = np.asarray(tpuimg.clahe(img, 4.0, xt, yt)).astype(int)
        assert np.max(np.abs(got - clahe_ref(img, 4.0, xt, yt).astype(int))) <= 1


def test_clahe_sharded_param_contract():
    """The sharded factory enforces the same parameter contract at build
    time (it used to accept anything until trace time)."""
    import jax

    from tpuimg.parallel.sharding import clahe_sharded, make_mesh

    assert jax.device_count() >= 8  # conftest provides 8 virtual devices
    mesh = make_mesh(2, 4)
    with pytest.raises(TpuImgError):
        clahe_sharded(mesh, 4.0, 0, 2)
    with pytest.raises(TpuImgError):
        clahe_sharded(mesh, -1.0, 2, 2)
