"""Test harness config: CPU backend with 8 virtual devices, fp64 enabled.

Golden-value physics tests run in float64 on CPU against the reference's
committed log values (SURVEY.md §4: small deterministic systems + golden
thermo/forces, tolerance-parameterized). Multi-chip sharding tests use the
8 virtual CPU devices.

NOTE: env vars are too late here — the axon TPU plugin's sitecustomize
imports jax at interpreter startup, so JAX_PLATFORMS/XLA_FLAGS are already
bound. jax.config.update still works after import, so we use that.
"""

import os

# harmless when sitecustomize already ran; effective when it didn't
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(12345)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
