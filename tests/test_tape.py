"""Tape (K14) conformance: tokenization parity with Python's split semantics."""

import numpy as np
import pytest

from stringwars_tpu.tape import PaddedTokens, Tape, bucket_by_length, token_spans


def test_words_matches_python_split(rng):
    text = b"  hello world\t\tfoo\nbar  baz\r\nqux  "
    tape = Tape.from_buffer(text, "words")
    assert tape.to_list() == text.split()


def test_lines_matches_python_split():
    text = b"a\nbb\n\nccc\n"
    tape = Tape.from_buffer(text, "lines")
    assert tape.to_list() == text.split(b"\n")


def test_file_mode():
    text = b"whole file"
    tape = Tape.from_buffer(text, "file")
    assert tape.to_list() == [text]


def test_random_corpus_words(rng):
    raw = rng.integers(32, 127, 100_000, dtype=np.uint8)
    text = raw.tobytes()
    tape = Tape.from_buffer(text, "words")
    assert tape.to_list() == text.split()


def test_unique_and_max_tokens():
    text = b"a b a c b a d"
    tape = Tape.from_buffer(text, "words", unique=True)
    assert tape.to_list() == [b"a", b"b", b"c", b"d"]
    tape2 = Tape.from_buffer(text, "words", max_tokens=3)
    assert tape2.to_list() == [b"a", b"b", b"a"]


def test_from_tokens_roundtrip():
    tokens = [b"", b"x", b"hello", b"\x00\xff", b"y" * 1000]
    tape = Tape.from_tokens(tokens)
    assert tape.to_list() == tokens
    assert tape.count == 5
    assert tape.total_bytes == sum(len(t) for t in tokens)


def test_subtape():
    tokens = [b"aa", b"bb", b"cc", b"dd"]
    tape = Tape.from_tokens(tokens)
    assert tape.subtape(1, 3).to_list() == [b"bb", b"cc"]


def test_padded_tokens_roundtrip():
    tokens = [b"short", b"a much longer token here", b"x"]
    tape = Tape.from_tokens(tokens)
    padded = PaddedTokens.from_tape(tape)
    mat = np.asarray(padded.data)
    lengths = np.asarray(padded.lengths)
    for i, t in enumerate(tokens):
        assert mat[i, : lengths[i]].tobytes() == t
        assert (mat[i, lengths[i] :] == 0).all()


def test_padded_tokens_u32_view():
    tape = Tape.from_tokens([bytes(range(1, 9))])
    padded = PaddedTokens.from_tape(tape, width=8, align=4)
    words = np.asarray(padded.as_u32())[0]
    assert words[0] == 0x04030201
    assert words[1] == 0x08070605


def test_bucket_by_length(rng):
    tokens = [bytes(rng.integers(97, 123, n, dtype=np.uint8)) for n in rng.integers(1, 300, 500)]
    tape = Tape.from_tokens(tokens)
    buckets = bucket_by_length(tape, [16, 64])
    recovered = []
    for b in buckets:
        mat, lens = np.asarray(b.data), np.asarray(b.lengths)
        recovered += [mat[i, : lens[i]].tobytes() for i in range(b.count)]
    assert sorted(recovered) == sorted(tokens)
    assert buckets[0].width <= 64 and buckets[1].width <= 64


@pytest.mark.parametrize("mode", ["lines", "words"])
def test_token_spans_empty(mode):
    starts, ends = token_spans(np.zeros(0, np.uint8), mode)
    if mode == "lines":
        assert list(starts) == [0] and list(ends) == [0]
    else:
        assert starts.size == 0
