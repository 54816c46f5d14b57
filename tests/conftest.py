"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere. Multi-chip sharding tests
use the 8 virtual CPU devices (the standard JAX substitute for a fake
distributed backend; see SURVEY.md §4).
"""

import os

# force CPU regardless of the ambient platform (the sandbox presets
# JAX_PLATFORMS=axon — the real TPU — and the axon plugin wins over the env
# var, so use jax.config which takes precedence)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
