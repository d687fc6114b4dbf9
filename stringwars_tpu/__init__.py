"""stringwars-tpu: a TPU-native string-processing framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of StringWars
(reference: /root/reference): first-party TPU kernels for substring/byteset
search, 64-bit + multiseed hashing, edit distances (Levenshtein/NW/SW),
MinHash fingerprints, UTF-8 machinery, Unicode case folding + normalization,
segmentation, argsort, memory ops and probabilistic filters — wrapped in a
wall-time-budgeted benchmark harness that reproduces the reference's variant
naming, work accounting and canonical report lines (reference: utils.py:243-336,
utils.rs:623-714).

Layout (maps SURVEY.md §7):
  - ``tape``       — the central (flat bytes, offsets) token container (K14)
  - ``ops``        — kernel families K1-K13, one module per family
  - ``parallel``   — mesh/device-scope + sharded collectives (K15)
  - ``utils``      — config, harness, reporting (L0-L3)
  - ``suites``     — runnable benchmark suites mirroring the reference's ten
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Honor JAX_PLATFORMS=cpu BEFORE any submodule can initialize the backend
# (several ops modules build jnp constants at import time, which would
# otherwise grab the tunneled TPU: the axon plugin ignores JAX_PLATFORMS,
# so both the env var and the config update are needed — see
# tests/conftest.py and suites/_common.py).
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    _os.environ["JAX_PLATFORM_NAME"] = "cpu"
    _jax.config.update("jax_platforms", "cpu")

# Multi-host: join the jax.distributed process group when SWTPU_COORDINATOR
# is set. This must happen before ANY backend touch, and importing this
# package is the first thing every suite/test does — so it lives here.
if _os.environ.get("SWTPU_COORDINATOR"):
    from stringwars_tpu.parallel.distributed import maybe_initialize as _maybe_init

    _maybe_init()

# Persistent XLA compilation cache: first compiles on the tunneled TPU can be
# slow (minutes); caching makes them one-time per program shape. Opt out by
# exporting JAX_COMPILATION_CACHE_DIR="".
#
# CPU-platform runs (tests, dryruns) get NO persistent cache: XLA:CPU AOT
# round-trips are not trustworthy — deserializing a cached CPU executable
# SIGSEGVs inside `compilation_cache.get_executable_and_time` (reproduced
# with a same-machine, same-process-writes cache on the large scanline
# sentence program), and entries are additionally non-portable across hosts
# with different CPU features. CPU compiles are seconds, not minutes; the
# cache only pays for itself on the tunneled TPU, where compiles run
# server-side and can take minutes.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _plat = (
        _os.environ.get("JAX_PLATFORMS", "")
        + _os.environ.get("JAX_PLATFORM_NAME", "")
        + (_jax.config.jax_platforms or "")
    )
    if "cpu" not in _plat:
        _cache_dir = _os.path.expanduser("~/.cache/swtpu-xla")
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stringwars_tpu.tape import Tape, PaddedTokens  # noqa: F401
