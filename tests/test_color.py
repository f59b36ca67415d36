import numpy as np
import pytest

from tpuimg.ops.color import (
    bgr_to_lab,
    lab_to_bgr,
    lab_to_rgb,
    rgb_to_gray,
    rgb_to_lab,
)


def test_lab_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    ours = np.asarray(rgb_to_lab(rgb))
    ref = cv2.cvtColor(rgb[..., ::-1], cv2.COLOR_BGR2Lab)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_lab_inverse_matches_opencv(rng):
    # Inverse compared on identical Lab inputs — roundtrip comparisons are
    # ill-conditioned (±1 Lab step can move saturated RGB by ~15 levels,
    # OpenCV's own roundtrip shows maxdiff ~19).
    cv2 = pytest.importorskip("cv2")
    lab = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    ours = np.asarray(lab_to_rgb(lab))
    ref = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)[..., ::-1]
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_lab_roundtrip_mean(rng):
    rgb = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    back = np.asarray(lab_to_rgb(rgb_to_lab(rgb)))
    assert np.abs(back.astype(int) - rgb.astype(int)).mean() < 1.0


def test_bgr_wrappers(rng):
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(bgr_to_lab(rgb[..., ::-1])), np.asarray(rgb_to_lab(rgb))
    )
    lab = np.asarray(rgb_to_lab(rgb))
    np.testing.assert_array_equal(
        np.asarray(lab_to_bgr(lab)), np.asarray(lab_to_rgb(lab))[..., ::-1]
    )


def test_gray_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    ours = np.asarray(rgb_to_gray(rgb))
    ref = cv2.cvtColor(rgb[..., ::-1], cv2.COLOR_BGR2GRAY)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
