"""Sharding parity on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import functools

import jax
import numpy as np
import pytest

from tpuimg import erode, gaussian, hist_equalize, integral
from tpuimg.core.borders import REFLECT101, REPLICATE
from tpuimg.ops.gaussian import gaussian_ypadded
from tpuimg.ops.morphology import morph_ypadded
from tpuimg.parallel import (
    hist_equalize_sharded,
    integral_sharded,
    make_mesh,
    shard_rows,
    stencil_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(2, 4)


def test_gaussian_sharded_matches_local(rng, mesh):
    img = rng.random((64, 96), dtype=np.float32)
    op = stencil_sharded(
        functools.partial(gaussian_ypadded, radius=2, sigma=1.5), 2, REFLECT101, mesh
    )
    out = np.asarray(jax.jit(op)(shard_rows(mesh, img)))
    ref = np.asarray(gaussian(img, 2, 1.5))
    assert np.abs(out - ref).max() < 1e-6


def test_erode_sharded_matches_local(rng, mesh):
    img = rng.integers(0, 256, (64, 80), dtype=np.uint8)
    op = stencil_sharded(
        functools.partial(morph_ypadded, radius=3, mode=0), 3, REPLICATE, mesh
    )
    out = np.asarray(jax.jit(op)(shard_rows(mesh, img)))
    np.testing.assert_array_equal(out, np.asarray(erode(img, 3)))


def test_integral_sharded_exact(rng, mesh):
    img = rng.integers(0, 256, (64, 72), dtype=np.uint8)
    out = np.asarray(jax.jit(integral_sharded(mesh))(shard_rows(mesh, img)))
    np.testing.assert_array_equal(out, np.asarray(integral(img)))


def test_he_sharded_exact(rng, mesh):
    img = rng.integers(0, 256, (64, 72), dtype=np.uint8)
    out = np.asarray(jax.jit(hist_equalize_sharded(mesh))(shard_rows(mesh, img)))
    np.testing.assert_array_equal(out, np.asarray(hist_equalize(img)))


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
