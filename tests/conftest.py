"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/pjit paths are
exercised on 8 virtual CPU devices instead (the TPU-world equivalent of a
fake multi-node backend). Environment must be set before jax is imported
anywhere, hence the top-level assignment here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: bench uses the real TPU, tests never do
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon site hook re-pins JAX_PLATFORMS at interpreter start, so the env
# var alone is not enough here — the config flag is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly marked ``slow`` is ``quick`` (pytest.ini)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
