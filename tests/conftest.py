"""Test configuration.

Tests run on CPU with float64 enabled (the numpy-oracle comparison axis,
mirroring the reference's backend-equivalence strategy, SURVEY.md §4) and with
8 virtual devices for mesh/topology-equivalence tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
