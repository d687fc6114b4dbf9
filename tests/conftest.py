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


def pytest_collection_modifyitems(items):
    """Run the heaviest-compile module first.

    The TR29 sentence program is the largest XLA:CPU compile in the suite.
    It compiles fine in a fresh process (standalone runs pass repeatedly),
    but after ~400 earlier tests' compiles the same backend_compile aborts
    inside LLVM (silent SIGABRT; with the persistent cache enabled it was a
    SIGSEGV deserializing the same program — see stringwars_tpu/__init__.py).
    Fronting the module reproduces the known-good fresh-process condition
    without splitting the suite into multiple invocations."""
    heavy = ("test_tr29_dual", "test_shiftand")  # crash-after-400-compiles club
    front = [it for it in items if any(h in it.nodeid for h in heavy)]
    rest = [it for it in items if not any(h in it.nodeid for h in heavy)]
    items[:] = front + rest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
