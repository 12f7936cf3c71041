"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the multi-chip test strategy from SURVEY.md section 4: unit tests on a
virtual device mesh; the driver separately dry-runs the multi-chip path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when a TPU tunnel is configured
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# The axon sitecustomize force-registers the TPU platform and sets
# jax_platforms="axon,cpu"; override it before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
