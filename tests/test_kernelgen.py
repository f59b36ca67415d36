import numpy as np
import pytest

from tpuimg.core.kernelgen import gaussian_kernel_1d, gaussian_kernel_2d


def test_small_kernel_table_sigma_zero():
    # OpenCV's fixed small-kernel table applies when ksize<=7 and sigma<=0
    np.testing.assert_allclose(gaussian_kernel_1d(3, 0.0),
                               [0.25, 0.5, 0.25])
    np.testing.assert_allclose(gaussian_kernel_1d(5, -1.0),
                               [0.0625, 0.25, 0.375, 0.25, 0.0625])


def test_derived_sigma_large_kernel():
    # ksize 9 with sigma<=0 derives sigma = 0.3*((9-1)*0.5-1)+0.8 = 1.7;
    # pin the FORMULA (sum~1 + center-max alone hold for any normalized
    # unimodal kernel and cannot catch a wrong derivation)
    k = gaussian_kernel_1d(9, 0.0)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k[4] == k.max()
    np.testing.assert_allclose(k, gaussian_kernel_1d(9, 1.7), rtol=1e-12)


def test_matches_opencv_kernel():
    # sigma > 0 only: OpenCV 5.x switched sigma<=0 to fixed-point n/256
    # tables; we keep the 4.x-era semantics the reference was built against
    # (the reference's demos always pass sigma > 0, gaussian.cu:417-423).
    cv2 = pytest.importorskip("cv2")
    for ksize, sigma in [(3, 1.0), (7, 1.5), (15, 2.5)]:
        ours = gaussian_kernel_1d(ksize, sigma, dtype=np.float64)
        ref = cv2.getGaussianKernel(ksize, sigma).ravel()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_even_ksize_rejected():
    with pytest.raises(ValueError):
        gaussian_kernel_1d(4, 1.0)


def test_2d_outer_product():
    k2 = gaussian_kernel_2d(2, 1.5)
    k1 = gaussian_kernel_1d(5, 1.5, dtype=np.float64)
    np.testing.assert_allclose(k2, np.outer(k1, k1), atol=1e-7)
