"""Validate the NumPy oracles against OpenCV itself (when cv2 is available).

This mirrors the reference's own verification scheme — OpenCV CPU as ground
truth compared by max-abs-diff (SURVEY.md §4 pattern 1) — but asserts
tolerances instead of printing them.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpuimg.oracle import (
    dilate_ref,
    erode_ref,
    gaussian_ref,
    hist_equalize_ref,
    integral_ref,
)


def test_gaussian_oracle_matches_cv(rng):
    img = rng.random((64, 96), dtype=np.float32)
    for radius, sigma in [(1, 1.0), (2, 1.5), (5, 3.0)]:
        ours = gaussian_ref(img, radius, sigma)
        ksz = 2 * radius + 1
        ref = cv2.GaussianBlur(img, (ksz, ksz), sigma, borderType=cv2.BORDER_DEFAULT)
        assert np.abs(ours - ref).max() < 1e-5


def test_integral_oracle_matches_cv(rng):
    img = rng.integers(0, 256, (53, 71), dtype=np.uint8)
    ours = integral_ref(img)
    ref = cv2.integral(img, sdepth=cv2.CV_32S)[1:, 1:]  # drop zero row/col
    np.testing.assert_array_equal(ours, ref)


def test_hist_equalize_oracle_matches_cv(rng):
    img = rng.integers(0, 256, (80, 120), dtype=np.uint8)
    ours = hist_equalize_ref(img)
    ref = cv2.equalizeHist(img)
    # OpenCV's LUT uses a slightly different formula (skips zero bins,
    # 255/(N-cdf_min) scaling); the reference CUDA LUT is cdf*256/N with
    # saturation — the CUDA reference itself shows the same small diffs vs
    # cv::equalizeHist (printed, never asserted). Allow 2 gray levels.
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_morphology_oracle_matches_cv(rng):
    img = rng.integers(0, 256, (61, 77), dtype=np.uint8)
    for radius in (1, 3, 7):
        ksz = 2 * radius + 1
        se = cv2.getStructuringElement(cv2.MORPH_RECT, (ksz, ksz))
        np.testing.assert_array_equal(erode_ref(img, radius), cv2.erode(img, se))
        np.testing.assert_array_equal(dilate_ref(img, radius), cv2.dilate(img, se))
