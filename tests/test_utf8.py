"""K8 conformance: UTF-8 count/validate/decode/find_nth vs CPython."""

import numpy as np
import pytest

from stringwars_tpu.ops.utf8 import utf8_count, utf8_decode, utf8_find_nth, utf8_validate

SAMPLES = [
    b"",
    b"plain ascii",
    "héllo wörld".encode(),
    "普通话 한국어 عربى".encode(),
    "🎉🎊 emoji \U0010ffff".encode(),
    "mixed ß ẞ ́ combining".encode(),
]

INVALID = [
    b"\x80",  # stray continuation
    b"\xc3",  # truncated 2-byte
    b"\xe2\x82",  # truncated 3-byte
    b"\xf0\x9f\x8e",  # truncated 4-byte
    b"\xc0\xaf",  # overlong '/'
    b"\xc1\xbf",  # overlong
    b"\xe0\x80\xaf",  # overlong 3-byte
    b"\xed\xa0\x80",  # surrogate D800
    b"\xf4\x90\x80\x80",  # > U+10FFFF
    b"\xf8\x88\x80\x80\x80",  # 5-byte form
    b"ok\x80stray",
    b"\xe2\x41\xac",  # lead interrupted by ASCII
]


def _arr(data: bytes):
    return np.frombuffer(data + b"\x00" * 8, np.uint8)


@pytest.mark.parametrize("sample", SAMPLES)
def test_count_and_decode(sample):
    n = len(sample)
    want = sample.decode("utf-8")
    assert int(utf8_count(_arr(sample), n)) == len(want)
    cps, count = utf8_decode(_arr(sample), n)
    assert int(count) == len(want)
    np.testing.assert_array_equal(np.asarray(cps)[: len(want)], [ord(c) for c in want])


@pytest.mark.parametrize("sample", SAMPLES)
def test_validate_accepts(sample):
    assert bool(utf8_validate(_arr(sample), len(sample)))


@pytest.mark.parametrize("bad", INVALID)
def test_validate_rejects(bad):
    assert not bool(utf8_validate(_arr(bad), len(bad)))


def test_validate_random_fuzz(rng):
    """Agreement with CPython's strict decoder over random byte soup."""
    for _ in range(200):
        n = int(rng.integers(0, 30))
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            data.decode("utf-8")
            want = True
        except UnicodeDecodeError:
            want = False
        assert bool(utf8_validate(_arr(data), n)) == want, data


def test_find_nth():
    s = "aé漢🎉z".encode()
    offs = [0, 1, 3, 6, 10]  # byte offsets of each codepoint
    for k, off in enumerate(offs):
        assert int(utf8_find_nth(_arr(s), len(s), k)) == off
    assert int(utf8_find_nth(_arr(s), len(s), 5)) == len(s)
