"""Test harness: force an 8-virtual-device CPU platform.

Multi-chip sharding paths are validated on a virtual CPU mesh
(xla_force_host_platform_device_count=8); real-TPU benchmarking happens in
bench.py, not in the test suite.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin overrides JAX_PLATFORMS; config.update wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
