"""Test config: run everything on a virtual 8-device CPU mesh.

JAX's CPU backend is the 'fake backend' (SURVEY.md §4): no TPU needed in CI,
and sharding/pjit paths are exercised on 8 virtual devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def img_batch(rng):
    """A small batch of random RGB images in [0,1], NCHW float32."""
    return rng.uniform(0.0, 1.0, size=(4, 3, 16, 16)).astype(np.float32)
