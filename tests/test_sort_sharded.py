"""Distributed sample-sort argsort vs the single-chip stable order.

Runs on the virtual 8-device CPU mesh (conftest); the sharded result
must equal argsort_tape exactly — including stability on duplicate
tokens and the host tie-refinement for >prefix tokens.
"""

from __future__ import annotations

import numpy as np
import pytest

from stringwars_tpu.ops.sort import argsort_sharded, argsort_tape
from stringwars_tpu.parallel.mesh import scope_variants
from stringwars_tpu.tape import Tape


def _scope(chips: int):
    for s in scope_variants(None):
        if s.chips == chips:
            return s
    pytest.skip(f"no {chips}-chip scope on this backend")


@pytest.mark.parametrize("n_tokens", [50, 4096])
def test_sharded_matches_single_chip(rng, n_tokens):
    words = [
        bytes(rng.integers(97, 110, rng.integers(1, 12), dtype=np.uint8))
        for _ in range(n_tokens)
    ]
    # Inject duplicates (stability) and a long token (tie refinement).
    words[5] = words[17] = words[31] = b"dup"
    words[7] = b"z" * 200
    words[9] = b"z" * 200 + b"a"
    tape = Tape.from_tokens(words)
    scope = _scope(max(s.chips for s in scope_variants(None)))
    got = argsort_sharded(tape, scope)
    want = argsort_tape(tape)
    assert np.array_equal(got, want), (
        f"first diff at {np.flatnonzero(got != want)[:5]}"
    )


def test_sharded_skewed_keys_falls_back_exact(rng):
    # All tokens share one leading byte: every row maps to one destination
    # shard -> guaranteed capacity overflow -> exact single-chip fallback.
    words = [b"a" + bytes(rng.integers(97, 123, 6, dtype=np.uint8)) for _ in range(2048)]
    tape = Tape.from_tokens(words)
    scope = _scope(max(s.chips for s in scope_variants(None)))
    got = argsort_sharded(tape, scope)
    want = argsort_tape(tape)
    assert np.array_equal(got, want)
