import numpy as np

from tpuimg.ops.metrics import max_abs_diff, max_abs_diff_loc


def test_int_exact_above_2p24():
    a = np.full((4, 4), 2**24, np.int32)
    b = a + 1
    assert int(max_abs_diff(a, b)) == 1  # f32 detour would report 0


def test_loc(rng):
    a = rng.integers(0, 255, (8, 16)).astype(np.int32)
    b = a.copy()
    b[3, 7] += 42
    d, y, x = max_abs_diff_loc(a, b)
    assert (int(d), int(y), int(x)) == (42, 3, 7)


def test_float_path(rng):
    a = rng.random((8, 8), dtype=np.float32)
    b = a + 0.5
    assert abs(float(max_abs_diff(a, b)) - 0.5) < 1e-6
