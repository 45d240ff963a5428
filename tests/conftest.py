"""Test configuration.

Tests run on CPU with float64 enabled (the numpy-oracle comparison axis,
mirroring the reference's backend-equivalence strategy, SURVEY.md §4) and with
8 virtual devices for mesh/topology-equivalence tests.
"""

import os

# force CPU: the ambient JAX_PLATFORMS=axon routes every compile through the
# TPU tunnel, which is both slow and wrong for oracle tests
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize pins the platform at import; this is the override
# that actually sticks
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
