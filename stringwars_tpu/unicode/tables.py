"""Unicode table generation (UCD 15.0 via CPython's unicodedata).

Produces dense, device-friendly arrays cached in ``~/.cache/swtpu-unicode``:

- ``fold``: full case folding (C+F): 1→N codepoint expansion stored as a
  flat expansion pool + per-cp (offset, length); 1:1 folds inline.
  Source of truth: ``str.casefold()`` (implements full Unicode case
  folding including ß→ss and ligatures).
- ``decomp_nfd`` / ``decomp_nfkd``: fully-expanded canonical / compat
  decompositions (pool + offsets), Hangul included (precomputed).
- ``ccc``: canonical combining class per cp.
- ``comp_pairs``: primary composites (starter, combining) → composed,
  derived by NFC round-trip so exclusions are honored.
- ``whitespace`` / ``newline``: boolean class tables (tokenization).

All tables cover the full plane range [0, 0x110000).
"""

from __future__ import annotations

import functools
import os
import sys
import unicodedata

import numpy as np

MAX_CP = 0x110000
_CACHE_DIR = os.path.expanduser("~/.cache/swtpu-unicode")

# The 25 Unicode whitespace codepoints the reference splits on
# (tokenization/bench.rs whitespaces) = str.isspace() plus NEL/ZWSP-adjacent
# set; we use Python's str.isspace() which matches UCD White_Space.
NEWLINE_CPS = (0x0A, 0x0B, 0x0C, 0x0D, 0x85, 0x2028, 0x2029)


def _cache_path(name: str) -> str:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    return os.path.join(_CACHE_DIR, f"{name}-ucd{unicodedata.unidata_version}.npz")


def _pooled(mapping: dict[int, list[int]]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode cp→sequence as (inline, offsets, pool): inline[cp] is the
    mapped cp when the expansion length is 1 (the common case), else -1;
    offsets[cp] packs (pool_offset << 5 | length) for multi-cp expansions
    (max observed length 18, U+FDFA under NFKD)."""
    inline = np.arange(MAX_CP, dtype=np.int32)
    multi_off = np.zeros(MAX_CP, dtype=np.int64)
    pool: list[int] = []
    for cp, seq in mapping.items():
        if len(seq) == 1:
            inline[cp] = seq[0]
        else:
            assert len(seq) < 32, (cp, seq)
            multi_off[cp] = (len(pool) << 5) | len(seq)
            inline[cp] = -1
            pool.extend(seq)
    return inline, multi_off, np.array(pool or [0], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def casefold_tables():
    """(inline, multi, pool): full case folding per codepoint."""
    path = _cache_path("fold")
    if os.path.exists(path):
        z = np.load(path)
        return z["inline"], z["multi"], z["pool"]
    print("generating case-fold tables (one-time)...", file=sys.stderr)
    mapping: dict[int, list[int]] = {}
    for cp in range(MAX_CP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        folded = chr(cp).casefold()
        if folded != chr(cp):
            mapping[cp] = [ord(c) for c in folded]
    inline, multi, pool = _pooled(mapping)
    np.savez_compressed(path, inline=inline, multi=multi, pool=pool)
    return inline, multi, pool


@functools.lru_cache(maxsize=None)
def decomposition_tables(compat: bool):
    """Fully-expanded NFD (or NFKD) decomposition per codepoint."""
    form = "NFKD" if compat else "NFD"
    path = _cache_path(form.lower())
    if os.path.exists(path):
        z = np.load(path)
        return z["inline"], z["multi"], z["pool"]
    print(f"generating {form} tables (one-time)...", file=sys.stderr)
    mapping: dict[int, list[int]] = {}
    for cp in range(MAX_CP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        expanded = unicodedata.normalize(form, chr(cp))
        if expanded != chr(cp):
            mapping[cp] = [ord(c) for c in expanded]
    inline, multi, pool = _pooled(mapping)
    np.savez_compressed(path, inline=inline, multi=multi, pool=pool)
    return inline, multi, pool


@functools.lru_cache(maxsize=None)
def ccc_table() -> np.ndarray:
    path = _cache_path("ccc")
    if os.path.exists(path):
        return np.load(path)["ccc"]
    ccc = np.zeros(MAX_CP, dtype=np.uint8)
    for cp in range(MAX_CP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ccc[cp] = unicodedata.combining(chr(cp))
    np.savez_compressed(path, ccc=ccc)
    return ccc


@functools.lru_cache(maxsize=None)
def composition_pairs() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(starters, combiners, composed): primary composites, exclusions
    honored (derived by NFC round-trip of each canonical 2-cp
    decomposition). Hangul LV/LVT excluded (algorithmic)."""
    path = _cache_path("comp")
    if os.path.exists(path):
        z = np.load(path)
        return z["starters"], z["combiners"], z["composed"]
    starters, combiners, composed = [], [], []
    ccc = ccc_table()
    for cp in range(MAX_CP):
        if 0xD800 <= cp <= 0xDFFF or 0xAC00 <= cp <= 0xD7A3:
            continue
        raw = unicodedata.decomposition(chr(cp))
        if not raw or raw.startswith("<"):
            continue
        parts = [int(p, 16) for p in raw.split()]
        if len(parts) != 2 or ccc[parts[0]] != 0:
            continue
        if unicodedata.normalize("NFC", chr(parts[0]) + chr(parts[1])) == chr(cp):
            starters.append(parts[0])
            combiners.append(parts[1])
            composed.append(cp)
    out = (
        np.array(starters, np.int32),
        np.array(combiners, np.int32),
        np.array(composed, np.int32),
    )
    np.savez_compressed(path, starters=out[0], combiners=out[1], composed=out[2])
    return out


@functools.lru_cache(maxsize=None)
def whitespace_table() -> np.ndarray:
    ws = np.zeros(MAX_CP, dtype=bool)
    for cp in range(0x4000):  # all UCD White_Space cps are < 0x4000
        if chr(cp).isspace():
            ws[cp] = True
    return ws


@functools.lru_cache(maxsize=None)
def newline_table() -> np.ndarray:
    nl = np.zeros(MAX_CP, dtype=bool)
    for cp in NEWLINE_CPS:
        nl[cp] = True
    return nl
