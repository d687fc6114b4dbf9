"""Gotoh Pallas kernel vs the XLA scan and the brute-force oracle."""

import numpy as np
import pytest

from stringwars_tpu.ops import similarity as S
from stringwars_tpu.ops.affine_pallas import AffineBatch, affine_from_tokens, affine_scores


def _rand_tokens(rng, n, lo, hi):
    return [bytes(rng.integers(65, 69, rng.integers(lo, hi), dtype=np.uint8)) for _ in range(n)]


@pytest.mark.parametrize("local", [False, True])
def test_affine_matches_oracle(rng, local):
    a_toks = _rand_tokens(rng, 33, 1, 40)
    b_toks = _rand_tokens(rng, 33, 1, 40)
    batch = affine_from_tokens(a_toks, b_toks)
    got = affine_scores(batch, local=local, interpret=True)
    ref = S.sw_ref if local else S.nw_ref
    for i, (x, y) in enumerate(zip(a_toks, b_toks)):
        want = ref(list(x), list(y), match=2, mismatch=-1, go=-5, ge=-1)
        assert got[i] == want, f"pair {i}: got {got[i]} want {want}"


def test_affine_matches_xla_scan(rng):
    B, L = 64, 32
    a = rng.integers(65, 69, (B, L), dtype=np.uint8).astype(np.int32)
    b = rng.integers(65, 69, (B, L), dtype=np.uint8).astype(np.int32)
    a_len = rng.integers(1, L + 1, B).astype(np.int32)
    b_len = rng.integers(1, L + 1, B).astype(np.int32)
    import jax.numpy as jnp

    pairs = S.PairBatch(jnp.asarray(a), jnp.asarray(b), jnp.asarray(a_len), jnp.asarray(b_len))
    want = np.asarray(S.nw_score_affine(pairs))
    got = affine_scores(AffineBatch(a, b, a_len, b_len), interpret=True)
    np.testing.assert_array_equal(got, want)


def test_affine_empty_and_edge():
    batch = affine_from_tokens([b"", b"abc", b""], [b"xy", b"", b""])
    got = affine_scores(batch, interpret=True)
    # all-gap alignments: open + (n-1) * extend
    assert got[0] == -5 + -1 * 1
    assert got[1] == -5 + -1 * 2
    assert got[2] == 0


@pytest.mark.parametrize("local", [False, True])
def test_linear_matches_oracle(rng, local):
    a_toks = _rand_tokens(rng, 33, 1, 40)
    b_toks = _rand_tokens(rng, 33, 1, 40)
    batch = affine_from_tokens(a_toks, b_toks)
    got = affine_scores(batch, gap_open=-2, gap_extend=-2, local=local, interpret=True)
    ref = S.sw_ref if local else S.nw_ref
    for i, (x, y) in enumerate(zip(a_toks, b_toks)):
        want = ref(list(x), list(y), match=2, mismatch=-1, go=-2, ge=-2)
        assert got[i] == want, f"pair {i}: got {got[i]} want {want}"


def test_linear_matches_xla_scan(rng):
    B, L = 64, 24
    a = rng.integers(65, 69, (B, L), dtype=np.uint8).astype(np.int32)
    b = rng.integers(65, 69, (B, L), dtype=np.uint8).astype(np.int32)
    a_len = rng.integers(1, L + 1, B).astype(np.int32)
    b_len = rng.integers(1, L + 1, B).astype(np.int32)
    import jax.numpy as jnp

    pairs = S.PairBatch(jnp.asarray(a), jnp.asarray(b), jnp.asarray(a_len), jnp.asarray(b_len))
    want = np.asarray(S.nw_score_linear(pairs))
    got = affine_scores(AffineBatch(a, b, a_len, b_len), gap_open=-2, gap_extend=-2, interpret=True)
    np.testing.assert_array_equal(got, want)



@pytest.mark.parametrize("linear", [False, True])
@pytest.mark.parametrize("local", [False, True])
def test_uniform_full_slab_extraction(rng, local, linear):
    """Uniform-length batches take the seed-peel + final-slab extraction
    path (no per-step fin writes); scores stay oracle-exact."""
    a_toks = [bytes(rng.integers(65, 69, 17, dtype=np.uint8)) for _ in range(19)]
    b_toks = [bytes(rng.integers(65, 69, 23, dtype=np.uint8)) for _ in range(19)]
    batch = affine_from_tokens(a_toks, b_toks)
    assert batch.uniform_full
    go, ge = (-2, -2) if linear else (-5, -1)
    got = affine_scores(batch, gap_open=go, gap_extend=ge, local=local, interpret=True)
    ref = S.sw_ref if local else S.nw_ref
    for i, (x, y) in enumerate(zip(a_toks, b_toks)):
        want = ref(list(x), list(y), match=2, mismatch=-1, go=go, ge=ge)
        assert got[i] == want, f"pair {i}: got {got[i]} want {want}"
