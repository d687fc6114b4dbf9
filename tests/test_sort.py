"""K11 conformance: stable argsort vs Python's sorted."""

import numpy as np
import pytest

from stringwars_tpu.ops.sort import argsort_tape, argsort_uncased, sorted_tokens
from stringwars_tpu.tape import Tape


def test_argsort_byte_order(rng):
    tokens = [bytes(rng.integers(97, 123, rng.integers(0, 12), dtype=np.uint8)) for _ in range(500)]
    tape = Tape.from_tokens(tokens)
    assert sorted_tokens(tape) == sorted(tokens)


def test_argsort_stability():
    tokens = [b"b", b"a", b"b", b"a", b"a"]
    order = list(argsort_tape(Tape.from_tokens(tokens)))
    assert order == [1, 3, 4, 0, 2]  # equal keys keep original order


def test_argsort_prefix_ordering():
    tokens = [b"abc", b"ab", b"abcd", b"", b"b"]
    assert sorted_tokens(Tape.from_tokens(tokens)) == sorted(tokens)


def test_argsort_binary_bytes(rng):
    tokens = [bytes(rng.integers(0, 256, rng.integers(1, 10), dtype=np.uint8)) for _ in range(300)]
    tape = Tape.from_tokens(tokens)
    assert sorted_tokens(tape) == sorted(tokens)


def test_argsort_uncased():
    tokens = ["Banana", "apple", "Cherry", "APPLE", "straße", "STRASSE", "zoo"]
    raw = [t.encode() for t in tokens]
    got = sorted_tokens(Tape.from_tokens(raw), uncased=True)
    want = [t.encode() for t in sorted(tokens, key=lambda s: [ord(c) for c in s.casefold()])]
    assert got == want
