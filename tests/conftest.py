"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised without TPU hardware via
``xla_force_host_platform_device_count`` (see SURVEY.md §4).  Must run before
jax is imported anywhere.
"""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must be
# local + deterministic, so force-override to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin regardless of env vars;
# the config update below is what actually pins tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
