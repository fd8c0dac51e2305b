"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Multi-chip TPU hardware is not available in CI; we validate the sharded
train/infer paths on a virtual 8-device CPU mesh per JAX best practice.
Must run before jax initializes, hence module-level in conftest.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
