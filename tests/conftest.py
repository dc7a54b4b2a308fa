"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-native equivalent of a fake distributed backend (SURVEY.md
§4): multi-chip sharding logic is exercised without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize registers the axon TPU PJRT plugin in every
# interpreter and overrides JAX_PLATFORMS; force the platform back to CPU
# before any backend is initialized (works because backends are lazy).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (production-size configs)"
    )


ABC_MINIMAL = "/root/reference/datasets/abc_minimal"


@pytest.fixture(scope="session")
def abc_minimal_dir():
    return ABC_MINIMAL


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)
