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


def test_argsort_long_tail_prefix_refinement(rng):
    """Tokens longer than the device prefix sort exactly via tie refinement."""
    long_a = b"x" * 200 + b"a"
    long_b = b"x" * 200 + b"b"
    long_c = b"x" * 200  # a strict prefix of the others
    tokens = [long_b, b"m", long_a, b"x" * 150, long_c, b"a", long_a]
    tape = Tape.from_tokens(tokens)
    got = sorted_tokens(tape)
    assert got == sorted(tokens)
    # Stability across equal long tokens.
    order = list(argsort_tape(tape, prefix_width=96))
    a_positions = [i for i, t in enumerate(tokens) if t == long_a]
    got_a = [i for i in order if tokens[i] == long_a]
    assert got_a == a_positions


def test_argsort_out_buffer():
    tokens = [b"c", b"a", b"b"]
    out = np.empty(3, dtype=np.intp)
    res = argsort_tape(Tape.from_tokens(tokens), out=out)
    assert res is out
    assert list(out) == [1, 2, 0]


def test_argsort_uncased_long_multibyte_tail():
    """UTF-8 boundary clamping: multibyte chars at the prefix edge."""
    base = ("é" * 60).encode()  # 120 bytes of 2-byte chars
    tokens = [base + "Z".encode(), base + "a".encode(), "É".encode(), "e".encode()]
    tape = Tape.from_tokens(tokens)
    got = sorted_tokens(tape, uncased=True)
    want = sorted(tokens, key=lambda b: [ord(c) for c in b.decode().casefold()])
    assert got == want


def test_argsort_uncased():
    tokens = ["Banana", "apple", "Cherry", "APPLE", "straße", "STRASSE", "zoo"]
    raw = [t.encode() for t in tokens]
    got = sorted_tokens(Tape.from_tokens(raw), uncased=True)
    want = [t.encode() for t in sorted(tokens, key=lambda s: [ord(c) for c in s.casefold()])]
    assert got == want


def test_argsort_exact_prefix_width_tie():
    """A token of length exactly prefix_width must refine against a longer
    token sharing its prefix (regression: strict > missed this boundary)."""
    exact = b"x" * 96            # length == prefix_width: key is maxed too
    longer = b"x" * 96 + b"a"    # identical 96-byte radix key
    tokens = [longer, exact, b"m", longer, exact]
    tape = Tape.from_tokens(tokens)
    assert sorted_tokens(tape) == sorted(tokens)
    order = list(argsort_tape(tape, prefix_width=96))
    assert [tokens[i] for i in order] == sorted(tokens)


def test_argsort_uncased_exact_prefix_width_tie():
    exact = b"X" * 96
    longer = b"x" * 96 + b"a"
    tokens = [longer, exact]
    tape = Tape.from_tokens(tokens)
    got = [t.decode().casefold() for t in sorted_tokens(tape, uncased=True)]
    assert got == sorted(t.decode().casefold() for t in tokens)


def test_multikey_and_lsd_paths_agree(rng):
    """The one-shot multi-key sort (short keys) and the LSD radix scan
    (wide keys) must produce the same stable permutation."""
    import jax.numpy as jnp

    from stringwars_tpu.ops.sort import _MULTIKEY_MAX_COLS, _byte_columns, _lsd_argsort

    B, W = 4096, 9  # 3 columns: multikey route
    data = rng.integers(97, 102, (B, W), dtype=np.uint8)
    lengths = rng.integers(0, W + 1, B).astype(np.int32)  # many ties
    cols = _byte_columns(jnp.asarray(data), jnp.asarray(lengths))
    assert cols.shape[0] <= _MULTIKEY_MAX_COLS
    got = np.asarray(_lsd_argsort(cols))
    # Wide-path result on the same keys: zero-pad columns past the
    # ceiling (zero columns are order-neutral padding at the LSD tail).
    wide = jnp.concatenate(
        [cols, jnp.zeros((_MULTIKEY_MAX_COLS + 1 - cols.shape[0], B), cols.dtype)]
    )
    want = np.asarray(_lsd_argsort(wide))
    np.testing.assert_array_equal(got, want)
    keys = [data[i, : lengths[i]].tobytes() for i in range(B)]
    assert [keys[i] for i in got] == sorted(keys)
