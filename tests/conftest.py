"""Test harness: run everything on a virtual 8-device CPU mesh.

The multi-host fake backend the reference never had (SURVEY.md section 4):
XLA_FLAGS host-platform device count gives N independent CPU devices, so all
sharding/collective logic is exercised without TPU hardware.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force CPU even when a sitecustomize hook has pre-registered/forced a TPU
# platform (config.update wins over registration-time selection). Set
# QUANTNET_TEST_TPU=1 to run tests on real hardware instead.
if not os.environ.get("QUANTNET_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_debug_nans", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def np_rng():
    return np.random.default_rng(0)
