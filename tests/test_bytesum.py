"""Bytesum (K4) exactness across sizes, including i32-overflow territory."""

import numpy as np
import pytest

from stringwars_tpu.ops.bytesum import bytesum, bytesum_device
from stringwars_tpu.tape import Tape


@pytest.mark.parametrize("n", [0, 1, 255, 4096, 100_000, 9_000_000])
def test_bytesum_exact(rng, n):
    data = rng.integers(0, 256, n, dtype=np.uint8)
    assert bytesum(data) == int(data.sum(dtype=np.int64))


def test_bytesum_overflow_i32():
    data = np.full(20_000_000, 255, dtype=np.uint8)  # sum = 5.1e9 > i32 max
    assert bytesum(data) == 255 * 20_000_000


def test_bytesum_tape(rng):
    tokens = [bytes(rng.integers(0, 256, n, dtype=np.uint8)) for n in [5, 100, 3000]]
    tape = Tape.from_tokens(tokens)
    assert bytesum(tape) == sum(sum(t) for t in tokens)


def test_bytesum_device(rng):
    data = rng.integers(0, 256, 50_000, dtype=np.uint8)
    import jax.numpy as jnp

    out = bytesum_device(jnp.asarray(data), 50_000)
    assert int(out) == int(data.sum(dtype=np.int64))


def test_bytesum_words_exact(rng):
    from stringwars_tpu.ops.bytesum import bytesum_words

    for n in (1, 3, 4, 9_999, 1_000_001):
        data = rng.integers(0, 256, n, dtype=np.uint8)
        padded = np.zeros(((n + 3) // 4) * 4, np.uint8)
        padded[:n] = data
        words = padded.view("<u4")
        assert bytesum_words(words, n) == int(data.sum(dtype=np.int64))


def test_bytesum_words_overflow_tiers():
    from stringwars_tpu.ops.bytesum import bytesum_words

    n = 40_000_000  # all-0xFF: exercises both accumulation tiers
    words = np.full(n // 4, 0xFFFFFFFF, np.uint32)
    assert bytesum_words(words, n) == 255 * n
