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
    """Run the heaviest-compile modules first.

    XLA:CPU's backend_compile crashes inside LLVM once a single process
    has accumulated ~300 tests' worth of JIT'd executables (SIGSEGV; with
    the persistent cache enabled it was a SIGSEGV deserializing the same
    program — see stringwars_tpu/__init__.py). Every big scanline-engine
    program compiles fine in a fresh process; whichever lands around test
    ~300 of the full run is the victim (test_tr29_dual in round 3,
    test_segment then test_scanline in round 5). Two defenses: front the
    heavy modules, and drop compiled executables every 100 tests
    (pytest_runtest_teardown below)."""
    heavy = ("test_tr29_dual", "test_shiftand", "test_segment", "test_scanline", "test_sentence", "test_linebreak")
    front = [it for it in items if any(h in it.nodeid for h in heavy)]
    rest = [it for it in items if not any(h in it.nodeid for h in heavy)]
    items[:] = front + rest


_TESTS_SINCE_CLEAR = [0]


def pytest_runtest_teardown(item, nextitem):
    """Release accumulated compiled executables every 100 tests (the
    crash-after-~300-compiles defense; costs a few recompiles of shared
    helpers, saves the LLVM JIT arena)."""
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= 100:
        _TESTS_SINCE_CLEAR[0] = 0
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
