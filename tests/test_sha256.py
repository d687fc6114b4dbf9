"""SHA-256 device kernel vs hashlib (FIPS 180-4 conformance)."""

import hashlib

import numpy as np
import pytest

from stringwars_tpu.ops.sha256 import prepare_sha256, sha256_digest_bytes
from stringwars_tpu.tape import PaddedTokens


def _bucket(tokens: list[bytes]) -> PaddedTokens:
    width = max(max(map(len, tokens), default=1), 1)
    data = np.zeros((len(tokens), width), np.uint8)
    for i, t in enumerate(tokens):
        data[i, : len(t)] = np.frombuffer(t, np.uint8)
        # junk past the length must not affect the digest
        data[i, len(t) :] = 0xAB
    return PaddedTokens(
        data=data,
        lengths=np.array([len(t) for t in tokens], np.int32),
        width=width,
    )


def _check(tokens: list[bytes]) -> None:
    got = sha256_digest_bytes(prepare_sha256(_bucket(tokens)))
    for i, t in enumerate(tokens):
        assert got[i].tobytes() == hashlib.sha256(t).digest(), f"token {i} ({len(t)}B)"


def test_boundary_lengths():
    # 55/56/63/64/65 straddle the padding/block boundaries.
    _check([b"", b"a", b"abc", b"x" * 55, b"y" * 56, b"z" * 63, b"w" * 64, b"v" * 65])


def test_two_and_three_blocks():
    _check([b"q" * 119, b"r" * 120, b"s" * 128, b"t" * 129, b"u" * 191, b"m" * 192])


@pytest.mark.parametrize("seed", [0, 1])
def test_random_mixed_lengths(seed):
    rng = np.random.default_rng(seed)
    tokens = [
        rng.integers(0, 256, int(n), dtype=np.uint8).tobytes()
        for n in rng.integers(0, 300, 40)
    ]
    _check(tokens)


def test_known_vector():
    got = sha256_digest_bytes(prepare_sha256(_bucket([b"abc"])))
    assert (
        got[0].tobytes().hex()
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
