import numpy as np
import pytest

from tpuimg import dilate, erode, morph_close, morph_open
from tpuimg.oracle import close_ref, dilate_ref, erode_ref, open_ref


# Radii spanning all three reference ladder rungs (r<=6 fused split,
# 7<=r<=20 van Herk smem, r>20 Gil-Werman pipeline — hMorphology
# image_process.cu:465-516) and our two code paths (shift-reduce / van Herk).
@pytest.mark.parametrize("radius", [1, 3, 6, 8, 15, 25])
def test_erode_dilate_exact(rng, radius):
    img = rng.integers(0, 256, (70, 93), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(erode(img, radius)), erode_ref(img, radius))
    np.testing.assert_array_equal(np.asarray(dilate(img, radius)), dilate_ref(img, radius))


def test_morph_float(rng):
    img = rng.random((40, 52), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(erode(img, 9)), erode_ref(img, 9))


def test_open_close(rng):
    img = rng.integers(0, 256, (45, 61), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(morph_open(img, 2)), open_ref(img, 2))
    np.testing.assert_array_equal(np.asarray(morph_close(img, 2)), close_ref(img, 2))


def test_morph_batched(rng):
    imgs = rng.integers(0, 256, (3, 30, 42), dtype=np.uint8)
    out = np.asarray(erode(imgs, 10))
    for i in range(3):
        np.testing.assert_array_equal(out[i], erode_ref(imgs[i], 10))


def test_31x31_se(rng):
    # BASELINE.json config 5: 31x31 SE (radius 15) via van Herk.
    img = rng.integers(0, 256, (100, 100), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(erode(img, 15)), erode_ref(img, 15))
