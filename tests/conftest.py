"""Test configuration: run JAX on CPU with 8 virtual devices.

Mirrors the rebuild test strategy (SURVEY.md §4): kernels are validated
against pure-jnp oracles on CPU; sharding is validated on a simulated
8-device mesh, so CI needs no TPU.
"""

import os

# Force CPU: the surrounding environment pins JAX_PLATFORMS=axon (a tunneled
# TPU); tests must be hermetic and run on the host.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone is NOT enough here: a sitecustomize registers the 'axon'
# TPU-tunnel backend and calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which shadows the env var. Initializing axon makes
# every test process handshake the (exclusive) TPU tunnel — 60-120s stalls.
# Re-pin the config before the first jax operation initializes backends.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
