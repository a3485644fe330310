"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip logic is validated without TPU hardware, the same way the reference
validated multi-GPU serving with virtual GPUs (SURVEY.md §4.5). The driver
separately dry-run-compiles the real multi-chip path via __graft_entry__.
"""

import os
import sys

# Force CPU: the harness environment pins JAX_PLATFORMS=axon (remote TPU with
# slow remote compiles), which must not leak into unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if "jax" in sys.modules:
    # The axon sitecustomize imports jax at interpreter startup; platform
    # selection happens at first backend use, so overriding the config here
    # still wins as long as no backend has been initialized yet.
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert not jax._src.xla_bridge._backends, (
        "a JAX backend initialized before tests/conftest.py could force CPU")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
