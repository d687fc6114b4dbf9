"""Bit-parallel Myers Levenshtein vs the brute-force DP oracle.

Interpret-mode compiles cost ~10-25 s per distinct (W, n_js, n_bt) shape,
so each test packs its coverage into ONE staged batch / one compile.
"""

import numpy as np

from stringwars_tpu.ops.myers_pallas import (
    _myers,
    myers_distances,
    myers_from_codepoints,
    myers_from_tokens,
)
from stringwars_tpu.ops.similarity import levenshtein_ref


def levenshtein_seq(a, b):
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[len(b)]


def check_pairs(a_tokens, b_tokens):
    batch = myers_from_tokens(a_tokens, b_tokens)
    got = myers_distances(batch)
    want = [levenshtein_ref(a, b) for a, b in zip(a_tokens, b_tokens)]
    np.testing.assert_array_equal(got, want)


def test_myers_mixed_batch(rng):
    """One batch covering: known cases, empty sides, 32-row word
    boundaries (m in {31,32,33,63,64,65,100}), random mixed lengths,
    and texts crossing JC column strips."""
    a_tokens = [b"kitten", b"flaw", b"abc", b"", b"same", b"a"]
    b_tokens = [b"sitting", b"lawn", b"abc", b"xyz", b"same", b""]
    pool = np.frombuffer(b"abcd", np.uint8)
    for m in [1, 31, 32, 33, 63, 64, 65, 100]:
        for _ in range(4):
            a_tokens.append(rng.choice(pool, m).tobytes())
            b_tokens.append(rng.choice(pool, int(rng.integers(1, 49))).tobytes())
    for _ in range(32):
        a_tokens.append(bytes(rng.integers(97, 105, int(rng.integers(0, 101)), dtype=np.uint8)))
        b_tokens.append(bytes(rng.integers(97, 105, int(rng.integers(0, 49)), dtype=np.uint8)))
    check_pairs(a_tokens, b_tokens)


def test_myers_more_than_one_tile(rng):
    """> 1024 pairs exercises the batch-tile grid dimension."""
    n = 1100
    a_tokens = [bytes(rng.integers(97, 101, 9, dtype=np.uint8)) for _ in range(n)]
    b_tokens = [bytes(rng.integers(97, 101, 11, dtype=np.uint8)) for _ in range(n)]
    check_pairs(a_tokens, b_tokens)


def test_myers_utf8_codepoints():
    a = [
        np.array([ord(c) for c in "héllo"], np.int32),
        np.array([0x10400, 0x61], np.int32),
        np.array([0x1F600, 0x1F601, 0x1F602], np.int32),
    ]
    b = [
        np.array([ord(c) for c in "hallo"], np.int32),
        np.array([0x10400, 0x62], np.int32),
        np.array([0x1F600, 0x1F602], np.int32),
    ]
    batch = myers_from_codepoints(a, b)
    got = myers_distances(batch)
    want = [levenshtein_seq(x.tolist(), y.tolist()) for x, y in zip(a, b)]
    np.testing.assert_array_equal(got, want)


def test_myers_sharded_tiles_match_single_device(rng):
    """The <Nchip> production path: tile axis sharded under shard_map must
    reproduce the single-device kernel's distances (virtual mesh, interpret
    mode)."""
    import jax
    import pytest
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from stringwars_tpu.parallel.mesh import SHARD_AXIS, make_mesh
    from stringwars_tpu.suites.similarities import shard_tiles

    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device mesh")
    scope = make_mesh(2)
    n_pairs = 2 * 1024  # two tiles -> one per device
    a_toks = [bytes(rng.integers(97, 101, rng.integers(1, 6), dtype=np.uint8)) for _ in range(n_pairs)]
    b_toks = [bytes(rng.integers(97, 101, rng.integers(1, 6), dtype=np.uint8)) for _ in range(n_pairs)]
    mb = myers_from_tokens(a_toks, b_toks)
    single = np.asarray(
        _myers(mb.bp, mb.b_cols, mb.blen, mb.lastw, mb.lastr, mb.alen, mb.n_words, mb.nbits, True)
    )

    consts = tuple(shard_tiles(scope, (mb.bp, mb.b_cols, mb.blen, mb.lastw, mb.lastr, mb.alen)))
    spec = lambda x: P(SHARD_AXIS, *([None] * (x.ndim - 1)))  # noqa: E731

    def local(bp, b_cols, blen, lastw, lastr, alen):
        return _myers(bp, b_cols, blen, lastw, lastr, alen, mb.n_words, mb.nbits, True)

    stepped = shard_map(
        local,
        mesh=scope.mesh,
        in_specs=tuple(spec(c) for c in consts),
        out_specs=P(SHARD_AXIS, None, None),
        check_vma=False,
    )
    sharded = np.asarray(stepped(*consts))
    np.testing.assert_array_equal(sharded[: single.shape[0]], single)


def test_myers_uniform_multiword_peel(rng):
    """Uniform pattern lengths spanning >1 word trigger the static
    last-word peel (score tracking outside the word loop)."""
    n, m = 64, 40  # W=2, last_word=1
    a_tokens = [bytes(rng.integers(97, 105, m, dtype=np.uint8)) for _ in range(n)]
    b_tokens = [bytes(rng.integers(97, 105, int(rng.integers(1, 60)), dtype=np.uint8)) for _ in range(n)]
    batch = myers_from_tokens(a_tokens, b_tokens)
    assert batch.last_word == 1
    check_pairs(a_tokens, b_tokens)
