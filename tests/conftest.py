"""Test configuration: force CPU with a virtual 8-device mesh.

Sharding/parallelism tests run on a virtual CPU mesh exactly as the driver's
``dryrun_multichip`` does; numeric tests are tolerance-calibrated for
float32.
"""

import os

# The container boots with JAX_PLATFORMS=axon and a sitecustomize that
# registers the TPU tunnel; tests must run on host CPU with 8 virtual
# devices, so force the config *after* jax import (env alone is overridden).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
