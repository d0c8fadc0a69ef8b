"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The container's sitecustomize imports jax at interpreter startup and
registers the axon TPU backend, so env vars alone are too late — we must
override through jax.config before any backend is instantiated. Parity
tests need CPU f32 conv numerics; mesh tests need 8 virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# CPU convs/matmuls run in reduced precision by default (measured: a single
# f32 4x4 conv differs from torch by 2e-3 rel; 'highest' restores 3e-7).
# Parity tests compare against torch f32, so force full f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU, got " + jax.devices()[0].platform
    )
    config.addinivalue_line(
        "markers",
        "slow: multi-minute golden/mesh/oracle tier; "
        "`pytest -m 'not slow'` is the fast developer loop",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
