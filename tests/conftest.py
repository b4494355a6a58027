"""Test config: run everything on a virtual 8-device CPU mesh.

JAX's CPU backend is the 'fake backend' (SURVEY.md §4): no TPU needed in CI,
and sharding/pjit paths are exercised on 8 virtual devices.

NOTE: this machine's sitecustomize registers the axon TPU plugin at
interpreter startup and pins JAX_PLATFORMS=axon, so plain env mutation here
is too late — we override through jax.config before any backend client is
created.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def img_batch(rng):
    """A small batch of random RGB images in [0,1], NCHW float32."""
    return rng.uniform(0.0, 1.0, size=(4, 3, 16, 16)).astype(np.float32)
