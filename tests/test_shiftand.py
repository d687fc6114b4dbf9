"""Multi-pattern Shift-And vs the native AC oracle."""

import numpy as np
import pytest

from stringwars_tpu.ops.ahocorasick import Automaton
from stringwars_tpu.ops.shiftand import MAX_BITS, ShiftAndSet, shiftand_count


def brute_count(patterns, hay: bytes) -> int:
    total = 0
    for p in patterns:
        start = 0
        while True:
            i = hay.find(p, start)
            if i < 0:
                break
            total += 1
            start = i + 1
    return total


@pytest.mark.parametrize(
    "patterns",
    [
        [b"the", b"and", b"tion", b"abcd"],
        [b"a"],
        [b"ab", b"ba", b"aa"],
        [b"abc", b"bc", b"c"],  # nested: every suffix fires
    ],
)
def test_shiftand_matches_brute(rng, patterns):
    hay = bytes(rng.integers(97, 101, 9_000, dtype=np.uint8))  # a-d soup
    sa = ShiftAndSet(patterns)
    got = shiftand_count(sa, np.frombuffer(hay, np.uint8), interpret=True)
    assert got == brute_count(patterns, hay)


def test_shiftand_matches_ac(rng):
    patterns = [b"the", b"and", b"tion", b"abcd"]
    hay = rng.integers(97, 123, 40_000, dtype=np.uint8)
    sa = ShiftAndSet(patterns)
    auto = Automaton(patterns)
    assert shiftand_count(sa, hay, interpret=True) == auto.count_host(hay)


def test_shiftand_capacity_guard():
    with pytest.raises(ValueError, match="exceeds"):
        ShiftAndSet([b"x" * (MAX_BITS + 1)])


def test_shiftand_seams(rng):
    # Matches straddling the 1024-chunk seams must be counted once.
    hay = np.frombuffer(b"needle" * 3000, np.uint8)
    sa = ShiftAndSet([b"needle", b"dle"])
    got = shiftand_count(sa, hay, interpret=True)
    assert got == 3000 * 2
