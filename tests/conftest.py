"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding paths are validated
on XLA's host platform with 8 virtual devices (the strategy SURVEY.md §4
prescribes). Pallas kernels run in interpreter mode on CPU.
"""

import os

# NOTE: the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME and the
# jax.config update below are what actually force the CPU backend here.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
