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
    with pytest.raises(ValueError, match="longer than"):
        ShiftAndSet([b"x" * 33])
    with pytest.raises(ValueError, match="exceeds"):
        ShiftAndSet([bytes([97 + i]) * 22 for i in range(3)])


def test_shiftand_seams(rng):
    # Matches straddling the 1024-chunk seams must be counted once.
    hay = np.frombuffer(b"needle" * 3000, np.uint8)
    sa = ShiftAndSet([b"needle", b"dle"])
    got = shiftand_count(sa, hay, interpret=True)
    assert got == 3000 * 2


def test_shiftand_two_words(rng):
    # > 32 total chars packs into two independent state words.
    patterns = [b"needle", b"haystack", b"pattern", b"search", b"string", b"find", b"match"]
    assert sum(map(len, patterns)) > 32
    sa = ShiftAndSet(patterns)
    assert sa.n_words == 2
    text = bytearray(rng.integers(97, 123, 20_000, dtype=np.uint8))
    for i in range(0, 19_000, 371):
        p = patterns[i % len(patterns)]
        text[i : i + len(p)] = p
    hay = bytes(text)
    got = shiftand_count(sa, np.frombuffer(hay, np.uint8), interpret=True)
    assert got == brute_count(patterns, hay)
