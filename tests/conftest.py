"""Test config: hermetic CPU backend with 8 virtual devices.

Must run before jax is imported anywhere (SURVEY.md §7: parity tests run on
the JAX CPU backend; sharding tests use a virtual 8-device mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the outer env pins JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize imports jax before this conftest runs, so
# env vars alone are too late — override the platform before backend init.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
