"""K5 conformance: wavefront DP vs brute-force textbook DP."""

import numpy as np
import pytest

from stringwars_tpu.ops.similarity import (
    PairBatch,
    levenshtein,
    levenshtein_ref,
    nw_ref,
    nw_score_affine,
    nw_score_linear,
    pack_pairs,
    sw_ref,
    sw_score_affine,
    sw_score_linear,
)


def random_pairs(rng, count, max_len, alphabet=4):
    pairs = []
    for _ in range(count):
        la, lb = int(rng.integers(0, max_len + 1)), int(rng.integers(0, max_len + 1))
        a = bytes((rng.integers(0, alphabet, la) + 65).astype(np.uint8))
        b = bytes((rng.integers(0, alphabet, lb) + 65).astype(np.uint8))
        pairs.append((a, b))
    return pairs


KNOWN = [
    (b"", b""),
    (b"", b"abc"),
    (b"abc", b""),
    (b"abc", b"abc"),
    (b"kitten", b"sitting"),
    (b"flaw", b"lawn"),
    (b"a", b"b"),
    (b"ACGTACGT", b"ACGT"),
]


def test_levenshtein_known():
    a, b = zip(*KNOWN)
    got = np.asarray(levenshtein(pack_pairs(list(a), list(b))))
    want = [levenshtein_ref(x, y) for x, y in KNOWN]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("max_len", [8, 40, 100])
def test_levenshtein_random(rng, max_len):
    pairs = random_pairs(rng, 32, max_len)
    a, b = zip(*pairs)
    got = np.asarray(levenshtein(pack_pairs(list(a), list(b))))
    want = [levenshtein_ref(x, y) for x, y in pairs]
    np.testing.assert_array_equal(got, want)


def test_nw_linear_random(rng):
    pairs = random_pairs(rng, 24, 50)
    a, b = zip(*pairs)
    got = np.asarray(nw_score_linear(pack_pairs(list(a), list(b))))
    want = [nw_ref(x, y, 2, -1, -2, -2) for x, y in pairs]
    np.testing.assert_array_equal(got, want)


def test_sw_linear_random(rng):
    pairs = random_pairs(rng, 24, 50)
    a, b = zip(*pairs)
    got = np.asarray(sw_score_linear(pack_pairs(list(a), list(b))))
    want = [sw_ref(x, y, 2, -1, -2, -2) for x, y in pairs]
    np.testing.assert_array_equal(got, want)


def test_nw_affine_random(rng):
    pairs = random_pairs(rng, 24, 40)
    a, b = zip(*pairs)
    got = np.asarray(nw_score_affine(pack_pairs(list(a), list(b))))
    want = [nw_ref(x, y, 2, -1, -5, -1) for x, y in pairs]
    np.testing.assert_array_equal(got, want)


def test_sw_affine_random(rng):
    pairs = random_pairs(rng, 24, 40)
    a, b = zip(*pairs)
    got = np.asarray(sw_score_affine(pack_pairs(list(a), list(b))))
    want = [sw_ref(x, y, 2, -1, -5, -1) for x, y in pairs]
    np.testing.assert_array_equal(got, want)


def test_mixed_length_extremes(rng):
    """One empty, one max-width, plus a pair far shorter than the padding."""
    pairs = [(b"", b"X" * 64), (b"Y" * 64, b"X" * 64), (b"ab", b"ba")]
    a, b = zip(*pairs)
    batch = pack_pairs(list(a), list(b), width=64)
    got = np.asarray(levenshtein(batch))
    want = [levenshtein_ref(x, y) for x, y in pairs]
    np.testing.assert_array_equal(got, want)
    got_nw = np.asarray(nw_score_linear(batch))
    want_nw = [nw_ref(x, y, 2, -1, -2, -2) for x, y in pairs]
    np.testing.assert_array_equal(got_nw, want_nw)


def test_dp_cells_accounting():
    batch = pack_pairs([b"abc", b"x"], [b"de", b"yyyy"])
    assert batch.dp_cells() == 3 * 2 + 1 * 4


def test_levenshtein_banded(rng):
    from stringwars_tpu.ops.similarity import levenshtein_banded

    pairs = random_pairs(rng, 24, 30)
    a, b = zip(*pairs)
    batch = pack_pairs(list(a), list(b))
    full = [levenshtein_ref(x, y) for x, y in pairs]
    got = np.asarray(levenshtein_banded(batch, band=64))
    # Band wider than any distance: exact.
    np.testing.assert_array_equal(got, full)
    # Narrow band: exact wherever the true distance fits in the band.
    narrow = np.asarray(levenshtein_banded(batch, band=4))
    for g, f in zip(narrow, full):
        if f <= 4:
            assert g == f
        else:
            assert g >= f or g >= 4


def test_levenshtein_utf8(rng):
    from stringwars_tpu.ops.similarity import pack_pairs_utf8

    pairs = [
        ("héllo".encode(), "hello".encode()),
        ("普通话".encode(), "普通".encode()),
        ("ßs".encode(), b"ss"),
        (b"", "é".encode()),
    ]
    a, b = zip(*pairs)
    batch = pack_pairs_utf8(list(a), list(b))
    got = np.asarray(levenshtein(batch))
    want = [
        levenshtein_ref(x.decode().encode("utf-32-le"), y.decode().encode("utf-32-le")) // 1
        for x, y in pairs
    ]
    # Codepoint-level ground truth via python lists:
    def ref_cp(x, y):
        xs, ys = [ord(c) for c in x.decode()], [ord(c) for c in y.decode()]
        prev = list(range(len(ys) + 1))
        for i in range(1, len(xs) + 1):
            cur = [i] + [0] * len(ys)
            for j in range(1, len(ys) + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (xs[i - 1] != ys[j - 1]))
            prev = cur
        return prev[len(ys)]

    np.testing.assert_array_equal(got, [ref_cp(x, y) for x, y in pairs])
