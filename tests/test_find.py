"""K1/K2 conformance: all-matches substring + byteset counts vs brute force."""

import numpy as np
import pytest

from stringwars_tpu.ops.find import (
    byteset_count,
    find_count,
    find_positions,
    pack_byteset,
    pack_needle,
)


def brute_positions(hay: bytes, needle: bytes) -> list[int]:
    return [p for p in range(len(hay) - len(needle) + 1) if hay[p : p + len(needle)] == needle]


@pytest.mark.parametrize("m", [1, 2, 3, 4, 5, 7, 8, 13, 16, 31, 40])
def test_find_random(rng, m):
    hay = rng.integers(0, 4, 10_000, dtype=np.uint8) + 97  # a-d alphabet: many matches
    hay_b = hay.tobytes()
    needle = hay_b[137 : 137 + m]
    packed = pack_needle(needle)
    want = brute_positions(hay_b, needle)
    assert int(find_count(hay, packed)) == len(want)
    np.testing.assert_array_equal(find_positions(hay, packed), want)


def test_find_overlapping():
    hay = b"aaaaaa"
    packed = pack_needle(b"aaa")
    assert int(find_count(np.frombuffer(hay, np.uint8), packed)) == 4


def test_find_at_boundaries():
    hay = b"xabc" + b"m" * 100 + b"abcx" + b"abc"
    packed = pack_needle(b"abc")
    got = find_positions(np.frombuffer(hay, np.uint8), packed)
    np.testing.assert_array_equal(got, brute_positions(hay, b"abc"))


def test_find_no_match():
    hay = np.frombuffer(b"hello world", np.uint8)
    assert int(find_count(hay, pack_needle(b"zzz"))) == 0


def test_find_needle_cycling_no_recompile():
    """Different needles of one capacity bucket reuse the same jit cache."""
    hay = np.frombuffer(b"the quick brown fox jumps over the lazy dog" * 50, np.uint8)
    for needle in [b"the", b"fox", b"lazy dog", b"q"]:
        packed = pack_needle(needle, capacity_words=4)
        assert int(find_count(hay, packed)) == len(brute_positions(hay.tobytes(), needle))


def test_find_long_needle():
    hay_b = b"prefix " + b"N" * 100 + b" suffix"
    needle = b"N" * 100
    packed = pack_needle(needle)
    assert packed.capacity >= 26
    assert int(find_count(np.frombuffer(hay_b, np.uint8), packed)) == 1


def test_empty_needle_rejected():
    with pytest.raises(ValueError):
        pack_needle(b"")


@pytest.mark.parametrize(
    "charset", [b"\n\r\x0b\x0c", b"</>&'\"=[]", b"0123456789", bytes(range(200, 256))]
)
def test_byteset_count(rng, charset):
    hay = rng.integers(0, 256, 50_000, dtype=np.uint8)
    table = pack_byteset(charset)
    want = int(np.isin(hay, np.frombuffer(charset, np.uint8)).sum())
    assert int(byteset_count(hay, table, hay.shape[0])) == want


def test_byteset_partial_length(rng):
    hay = np.frombuffer(b"123abc456", np.uint8)
    table = pack_byteset(b"0123456789")
    assert int(byteset_count(hay, table, 4)) == 3  # "123a" has 3 digits
