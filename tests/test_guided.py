import numpy as np
import pytest

from tpuimg import box_filter, guided_filter
from tpuimg.oracle import box_filter_ref, guided_filter_ref


@pytest.mark.parametrize("border", ["shrink", "reflect101"])
@pytest.mark.parametrize("radius", [1, 4, 8])
def test_box_filter_matches_oracle(rng, border, radius):
    img = rng.random((48, 64), dtype=np.float32)
    out = np.asarray(box_filter(img, radius, border=border))
    ref = box_filter_ref(img, radius, border=border)
    assert np.abs(out - ref).max() < 1e-5


@pytest.mark.parametrize("border", ["shrink", "reflect101"])
@pytest.mark.parametrize("radius,eps", [(1, 0.3), (4, 1e-3), (8, 1e-3)])
def test_guided_filter_matches_oracle(rng, border, radius, eps):
    I = rng.random((56, 72), dtype=np.float32)
    p = np.clip(I + 0.1 * rng.standard_normal((56, 72)), 0, 1).astype(np.float32)
    out = np.asarray(guided_filter(I, p, radius, eps, border=border))
    ref = guided_filter_ref(I, p, radius, eps, border=border)
    assert np.abs(out - ref).max() < 1e-3  # BASELINE.json float tolerance


def test_guided_filter_self_guide(rng):
    I = rng.random((40, 40), dtype=np.float32)
    out = np.asarray(guided_filter(I, I, 4, 1e-2))
    ref = guided_filter_ref(I, I, 4, 1e-2)
    assert np.abs(out - ref).max() < 1e-3


def test_guided_color_src_gray_guide(rng):
    # reference CN1 path: 3-channel source, single-channel guide
    I = rng.random((40, 60), dtype=np.float32)
    p = rng.random((3, 40, 60), dtype=np.float32)
    out = np.asarray(guided_filter(I, p, 4, 1e-2))
    assert out.shape == (3, 40, 60)
    for c in range(3):
        ref = guided_filter_ref(I, p[c], 4, 1e-2, border="shrink")
        assert np.abs(out[c] - ref).max() < 1e-3


def test_guided_self_guide_specialization_bitwise(rng):
    # p-is-I triggers the 2-mean specialization (kernel_self); same math as
    # the general 4-mean path fed two equal-valued arrays, so any gap beyond
    # XLA fusion/reassociation noise (~1e-7) is a logic error
    I = rng.random((48, 150), dtype=np.float32)
    for border in ("shrink", "reflect101"):
        fast = np.asarray(guided_filter(I, I, 8, 1e-3, border=border))
        general = np.asarray(guided_filter(I, I.copy(), 8, 1e-3, border=border))
        assert np.abs(fast - general).max() < 1e-6


@pytest.mark.parametrize("radius", [1, 4, 12])
def test_guided_self_guide_radii(rng, radius):
    I = rng.random((80, 140), dtype=np.float32)
    out = np.asarray(guided_filter(I, I, radius, 1e-2, border="reflect101"))
    ref = guided_filter_ref(I, I, radius, 1e-2, border="reflect101")
    assert np.abs(out - ref).max() < 1e-3
