"""K2 conformance: device AC scan vs native sequential scan vs brute force."""

import numpy as np
import pytest

from stringwars_tpu.ops.ahocorasick import Automaton, ac_count


def brute_count(hay: bytes, patterns: list[bytes]) -> int:
    total = 0
    for p in patterns:
        for i in range(len(hay) - len(p) + 1):
            total += hay[i : i + len(p)] == p
    return total


def test_ac_classic():
    a = Automaton([b"he", b"she", b"his", b"hers"])
    hay = b"ushers he said his history"
    want = brute_count(hay, a.patterns)
    data = np.frombuffer(hay, np.uint8)
    assert a.count_host(data) == want
    assert ac_count(a, data) == want


def test_ac_overlapping_and_nested():
    a = Automaton([b"aa", b"aaa", b"a"])
    hay = b"aaaaa"
    data = np.frombuffer(hay, np.uint8)
    want = brute_count(hay, a.patterns)  # 5 + 4 + 3 = 12
    assert want == 12
    assert ac_count(a, data) == want


def test_ac_chunk_boundaries(rng):
    """Matches spanning chunk seams must be counted exactly once."""
    patterns = [b"abcabc", b"cab", b"bc"]
    hay = bytes(rng.choice(np.frombuffer(b"abc", np.uint8), 20_000).tolist())
    a = Automaton(patterns)
    data = np.frombuffer(hay, np.uint8)
    want = a.count_host(data)
    assert ac_count(a, data, chunk=256) == want
    assert ac_count(a, data, chunk=4096) == want


def test_ac_random_patterns(rng):
    patterns = list({bytes(rng.integers(97, 100, rng.integers(1, 6), dtype=np.uint8)) for _ in range(20)})
    hay = bytes(rng.integers(97, 100, 5000, dtype=np.uint8).tolist())
    a = Automaton(patterns)
    data = np.frombuffer(hay, np.uint8)
    assert ac_count(a, data) == brute_count(hay, patterns) == a.count_host(data)


def test_ac_byteset_equivalence(rng):
    """Single-byte patterns == byteset counting (the reference's usage)."""
    charset = b"</>&'\"=[]"
    a = Automaton([bytes([c]) for c in charset])
    hay = rng.integers(0, 256, 30_000, dtype=np.uint8)
    want = int(np.isin(hay, np.frombuffer(charset, np.uint8)).sum())
    assert ac_count(a, hay) == want


def test_ac_pallas_matches_host(rng):
    """Flat-key rule scan (Pallas, interpret) == native sequential count."""
    from stringwars_tpu.ops.ahocorasick import Automaton, ac_count_pallas

    hay = rng.integers(97, 103, 20_000, dtype=np.uint8)
    patterns = [b"ab", b"bc", b"abc", b"aa", b"f"]
    a = Automaton(patterns)
    want = a.count_host(hay)
    got = ac_count_pallas(a, hay, interpret=True)
    assert got == want


def test_ac_pallas_byteset_single_bytes(rng):
    from stringwars_tpu.ops.ahocorasick import Automaton, ac_count_pallas

    hay = rng.integers(0, 256, 9_000, dtype=np.uint8)
    charset = b"0123456789"
    a = Automaton([bytes([c]) for c in charset])
    want = int(np.isin(hay, np.frombuffer(charset, np.uint8)).sum())
    assert ac_count_pallas(a, hay, interpret=True) == want


def test_ac_lut_and_walk_kernels_agree(rng):
    """Both Pallas scan kernels (lane-gather LUT and flat-key rule walk)
    must match the native sequential count on the same automaton."""
    import jax.numpy as jnp

    from stringwars_tpu.ops.ahocorasick import (
        Automaton,
        _ac_scan_pallas,
        _ac_scan_pallas_lut,
        automaton_luts,
        automaton_rules,
        stage_cols,
    )

    hay = rng.integers(97, 103, 30_000, dtype=np.uint8)
    a = Automaton([b"ab", b"bca", b"aaaa", b"cb", b"abcabc"])
    want = a.count_host(hay)
    n = hay.shape[0]
    cols, gpos0, overlap, limit = stage_cols(hay, n, a.max_len)
    meta = jnp.asarray([n, limit], jnp.int32)

    mode, n_pm, tables = automaton_luts(a)
    assert mode is not None  # small dict: the LUT must win the cost model
    got_lut = int(_ac_scan_pallas_lut(tables, meta, cols, gpos0, mode, n_pm, overlap, True))
    key_rules, oc_rules = automaton_rules(a)
    got_walk = int(
        _ac_scan_pallas(
            jnp.asarray(key_rules.starts), jnp.asarray(key_rules.deltas),
            jnp.asarray(oc_rules.starts), jnp.asarray(oc_rules.deltas),
            meta, cols, gpos0, key_rules.count, oc_rules.count, overlap, True,
        )
    )
    assert got_lut == want == got_walk and want > 0
