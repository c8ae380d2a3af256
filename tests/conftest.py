"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via the standard JAX
trick: force the host platform to expose 8 virtual CPU devices.  The XLA flag
must be set before jax's backend initializes; the platform choice must go
through jax.config.update because this image's sitecustomize pre-registers a
TPU ("axon") PJRT plugin and pins jax_platforms to it.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
