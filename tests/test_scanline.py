"""Fused Pallas scan engine vs the XLA associative-scan oracle.

The scanline path is the production TPU feature stage for segmentation
(``ops/segment.py``); on CPU it runs in Pallas interpret mode. Each test
asserts bit-identical boundary masks/counts between ``scanline=True`` and
``scanline=False`` on fuzzed UTF-8 streams, so the compile-light kernel
is pinned to the oracle the conformance suite already validates against
uniseg/ICU-derived fixtures.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from stringwars_tpu.ops import segment as SEG
from stringwars_tpu.ops.scanline import Op, fused_scan


def _fuzz_text(seed: int, n_cps: int = 4000) -> bytes:
    """Multilingual + boundary-heavy soup: ASCII words, digits/punct,
    combining marks, Hangul, RI flags, ZWJ emoji, CR/LF."""
    rng = np.random.default_rng(seed)
    pieces = []
    pool = [
        "word", "Don't", "can't", "3.14", "1,000", "a.b", "U.S.A. Next",
        "א׳", "א״א",  # Hebrew quotes
        "é́", "x‍☺", "\U0001F1FA\U0001F1F8\U0001F1EB\U0001F1F7",
        "가각", " ", "  ", "\r\n", "\n", "\t",
        "Mr. Smith went. Home! now? ok", "क्ष",  # Indic conjunct
        "̀̀", "été", "あア中",
        "(foo) [bar]", "$100", "US$-10", "a-b", "“quoted”",
        "\U0001F600\U0001F3FB", "‍", "­", "ë",
    ]
    for _ in range(n_cps // 4):
        pieces.append(pool[int(rng.integers(0, len(pool)))])
    return "".join(pieces).encode()


_KERNELS = [
    ("whitespace", lambda d, n: SEG.whitespace_token_count(d, n, scanline=None)),
    ("grapheme", lambda d, n: SEG.grapheme_boundaries(d, n, scanline=None)),
    ("word", lambda d, n: SEG.word_boundaries(d, n, scanline=None)),
    ("sentence", lambda d, n: SEG.sentence_boundaries(d, n, scanline=None)),
    ("linebreak", lambda d, n: SEG.linebreak_opportunities(d, n, scanline=None)),
]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("name", ["whitespace", "grapheme", "word", "sentence", "linebreak"])
def test_scanline_matches_xla(name, seed):
    raw = _fuzz_text(seed)
    data = jnp.asarray(np.frombuffer(raw, np.uint8))
    n = int(data.shape[0])
    fns = {
        "whitespace": SEG.whitespace_token_count,
        "grapheme": SEG.grapheme_boundaries,
        "word": SEG.word_boundaries,
        "sentence": SEG.sentence_boundaries,
        "linebreak": SEG.linebreak_opportunities,
    }
    fn = fns[name]
    got = fn(data, n, scanline=True)
    want = fn(data, n, scanline=False)
    if isinstance(want, tuple):
        gb, gc = got
        wb, wc = want
        mism = np.flatnonzero(np.asarray(gb) != np.asarray(wb))
        assert mism.size == 0, f"{name}: first mask mismatches at {mism[:10]}"
        assert int(gc) == int(wc)
    else:
        assert int(got) == int(want)


def test_scanline_tile_boundaries():
    """Streams straddling the 8192-element tile: carries must hand off
    exactly (a combining run crossing the tile edge)."""
    base = ("a" * 8189 + "é́x lorem. Ipsum\r\n" + "b" * 9000).encode()
    data = jnp.asarray(np.frombuffer(base, np.uint8))
    n = int(data.shape[0])
    for fn in (SEG.grapheme_boundaries, SEG.word_boundaries, SEG.sentence_boundaries,
               SEG.linebreak_opportunities):
        gb, gc = fn(data, n, scanline=True)
        wb, wc = fn(data, n, scanline=False)
        assert np.array_equal(np.asarray(gb), np.asarray(wb))
        assert int(gc) == int(wc)


def test_fused_scan_reverse_and_chaining():
    rng = np.random.default_rng(3)
    n = 12345
    v = rng.integers(0, 50, n).astype(np.int32)
    f = (rng.random(n) < 0.2).astype(np.int32)
    ops = (
        Op("sum", "s", lambda e: e["f"]),
        Op("last", "lv", lambda e: (e["s"] * 2, e["f"]), init=-5),
        Op("delay", "d", lambda e: e["lv"], init=-5),
    )
    out = fused_scan({"v": jnp.asarray(v), "f": jnp.asarray(f)}, ops, n, interpret=True)
    s = np.cumsum(f)
    lv = np.full(n, -5, np.int64)
    cur = -5
    for i in range(n):
        if f[i]:
            cur = s[i] * 2
        lv[i] = cur
    assert np.array_equal(np.asarray(out["s"]), s)
    assert np.array_equal(np.asarray(out["lv"]), lv)
    assert np.array_equal(np.asarray(out["d"]), np.concatenate([[-5], lv[:-1]]))
