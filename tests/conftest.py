"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This must run before jax initializes its backends, hence the env vars are set
at conftest import time (pytest imports conftest before test modules).
"""

import os

# Hard-set: the driver environment presets JAX_PLATFORMS=axon (a tunneled
# TPU) and something in site config re-forces it, so the env var alone is not
# enough — set the jax config explicitly before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
