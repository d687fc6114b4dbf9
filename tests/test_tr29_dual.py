"""Dual-implementation conformance for TR29 word/sentence boundaries.

The vectorized kernels (``ops/segment.py``) are checked against scalar
reference implementations written independently from the UAX#29 rule
text (15.1): classic skip-ignorable walkers with explicit lookahead —
a completely different evaluation strategy than the kernels'
table-driven dense scans, over the same class tables. Pairwise class
representatives + random class soup reproduce the WordBreakTest /
SentenceBreakTest methodology.
"""

import numpy as np

from stringwars_tpu.ops.segment import word_segments, sentence_segments
from stringwars_tpu.unicode import tables

_W = {name: i for i, name in enumerate(tables.WB_VALUES)}
_S = {name: i for i, name in enumerate(tables.SB_VALUES)}


# ---------------------------------------------------------------------------
# Scalar UAX#29 word boundary reference (rules WB1-WB999)
# ---------------------------------------------------------------------------

def _wb_class(cp: int) -> int:
    return int(tables.word_break_table()[cp])


def ref_word_boundaries(cps: list[int]) -> list[bool]:
    """boundary[i] == True iff a word boundary precedes cps[i]."""
    n = len(cps)
    cls = [_wb_class(c) for c in cps]
    W = _W
    AH = (W["ALetter"], W["Hebrew_Letter"])
    MidNumLetQ = (W["MidNumLet"], W["Single_Quote"])
    ignore = (W["Extend"], W["Format"], W["ZWJ"])
    newlineish = (W["Newline"], W["CR"], W["LF"])

    # Positions that survive WB4 (an ignorable after sot or a newline is
    # NOT absorbed).
    kept = []
    for i in range(n):
        if cls[i] in ignore and i > 0 and cls[i - 1] not in newlineish:
            continue
        kept.append(i)

    kcls = [cls[i] for i in kept]
    boundary = [False] * n
    if n:
        boundary[0] = True  # WB1

    def k_at(j):
        return kcls[j] if 0 <= j < len(kcls) else None

    for j in range(1, len(kept)):
        i = kept[j]
        p, c = kcls[j - 1], kcls[j]
        raw_prev = cls[i - 1]
        brk = True
        # WB3: CR x LF (raw adjacency)
        if raw_prev == W["CR"] and cls[i] == W["LF"] and i - 1 == kept[j - 1]:
            brk = False
        elif p in newlineish or c in newlineish:
            brk = True  # WB3a/3b
        elif raw_prev == W["ZWJ"] and tables.extended_pictographic_table()[cps[i]]:
            brk = False  # WB3c (raw ZWJ immediately before)
        elif p == W["WSegSpace"] and c == W["WSegSpace"] and i - 1 == kept[j - 1]:
            brk = False  # WB3d (no intervening ignorables)
        elif p in AH and c in AH:
            brk = False  # WB5
        elif p in AH and (c == W["MidLetter"] or c in MidNumLetQ) and (k_at(j + 1) in AH):
            brk = False  # WB6
        elif (p == W["MidLetter"] or p in MidNumLetQ) and c in AH and (k_at(j - 2) in AH):
            brk = False  # WB7
        elif p == W["Hebrew_Letter"] and c == W["Single_Quote"]:
            brk = False  # WB7a
        elif p == W["Hebrew_Letter"] and c == W["Double_Quote"] and k_at(j + 1) == W["Hebrew_Letter"]:
            brk = False  # WB7b
        elif p == W["Double_Quote"] and c == W["Hebrew_Letter"] and k_at(j - 2) == W["Hebrew_Letter"]:
            brk = False  # WB7c
        elif p == W["Numeric"] and c == W["Numeric"]:
            brk = False  # WB8
        elif p in AH and c == W["Numeric"]:
            brk = False  # WB9
        elif p == W["Numeric"] and c in AH:
            brk = False  # WB10
        elif (p == W["MidNum"] or p in MidNumLetQ) and c == W["Numeric"] and k_at(j - 2) == W["Numeric"]:
            brk = False  # WB11
        elif p == W["Numeric"] and (c == W["MidNum"] or c in MidNumLetQ) and k_at(j + 1) == W["Numeric"]:
            brk = False  # WB12
        elif p == W["Katakana"] and c == W["Katakana"]:
            brk = False  # WB13
        elif (
            p in AH + (W["Numeric"], W["Katakana"], W["ExtendNumLet"])
            and c == W["ExtendNumLet"]
        ):
            brk = False  # WB13a
        elif p == W["ExtendNumLet"] and (c in AH or c in (W["Numeric"], W["Katakana"])):
            brk = False  # WB13b
        elif p == W["Regional_Indicator"] and c == W["Regional_Indicator"]:
            run = 0  # WB15/16: count RIs ending at j-1
            jj = j - 1
            while jj >= 0 and kcls[jj] == W["Regional_Indicator"]:
                run += 1
                jj -= 1
            brk = run % 2 == 0
        boundary[i] = brk
    # Ignored positions never open a boundary (absorbed into the left).
    return boundary


def ref_word_segments(text: str) -> list[str]:
    cps = [ord(c) for c in text]
    b = ref_word_boundaries(cps)
    out, cur = [], ""
    for i, ch in enumerate(text):
        if b[i] and cur:
            out.append(cur)
            cur = ""
        cur += ch
    if cur:
        out.append(cur)
    return out


# ---------------------------------------------------------------------------
# Scalar UAX#29 sentence boundary reference (rules SB1-SB998)
# ---------------------------------------------------------------------------

def ref_sentence_boundaries(cps: list[int]) -> list[bool]:
    n = len(cps)
    S = _S
    cls = [int(tables.sentence_break_table()[c]) for c in cps]
    parasep = (S["Sep"], S["CR"], S["LF"])
    satrm = (S["ATerm"], S["STerm"])
    ignore = (S["Extend"], S["Format"])

    kept = []
    for i in range(n):
        if cls[i] in ignore and i > 0 and cls[i - 1] not in parasep:
            continue
        kept.append(i)
    kcls = [cls[i] for i in kept]
    m = len(kept)

    def k(j):
        return kcls[j] if 0 <= j < m else None

    boundary = [False] * n
    if n:
        boundary[0] = True

    for j in range(1, m):
        i = kept[j]
        p, c = kcls[j - 1], kcls[j]
        # SB3: CR x LF
        if p == S["CR"] and c == S["LF"]:
            boundary[i] = False
            continue
        # SB4: ParaSep ÷
        if p in parasep:
            boundary[i] = True
            continue
        # SB6: ATerm x Numeric
        if p == S["ATerm"] and c == S["Numeric"]:
            continue
        # SB7: (Upper|Lower) ATerm x Upper
        if p == S["ATerm"] and c == S["Upper"] and k(j - 2) in (S["Upper"], S["Lower"]):
            continue

        # Shared context: backtrack over Sp* then Close* to a SATerm?
        jj = j - 1
        sp_seen = False
        while jj >= 0 and kcls[jj] == S["Sp"]:
            jj -= 1
            sp_seen = True
        close_end = jj
        while jj >= 0 and kcls[jj] == S["Close"]:
            jj -= 1
        has_term = jj >= 0 and kcls[jj] in satrm
        term_cls = kcls[jj] if has_term else None

        if has_term:
            # SB8: ATerm Close* Sp* x (not-in-set)* Lower
            if term_cls == S["ATerm"]:
                la = j
                skip = (
                    S["OLetter"],
                    S["Upper"],
                    S["Lower"],
                    S["Sep"],
                    S["CR"],
                    S["LF"],
                    S["ATerm"],
                    S["STerm"],
                )
                while la < m and kcls[la] not in skip:
                    la += 1
                if la < m and kcls[la] == S["Lower"]:
                    continue
            # SB8a: SATerm Close* Sp* x (SContinue|SATerm)
            if c == S["SContinue"] or c in satrm:
                continue
            # SB9: SATerm Close* x (Close|Sp|ParaSep) [no Sp between]
            if not sp_seen and (c == S["Close"] or c == S["Sp"] or c in parasep):
                continue
            # SB10: SATerm Close* Sp* x (Sp|ParaSep)
            if c == S["Sp"] or c in parasep:
                continue
            # SB11: SATerm Close* Sp* ParaSep? ÷
            boundary[i] = True
            continue
        # SB998
        continue
    return boundary


def ref_sentence_segments(text: str) -> list[str]:
    cps = [ord(c) for c in text]
    b = ref_sentence_boundaries(cps)
    out, cur = [], ""
    for i, ch in enumerate(text):
        if b[i] and cur:
            out.append(cur)
            cur = ""
        cur += ch
    if cur:
        out.append(cur)
    return out


# ---------------------------------------------------------------------------
# Representatives + tests
# ---------------------------------------------------------------------------

def _reps(table, values, per_class=2):
    reps = []
    for vi, name in enumerate(values):
        cps = np.flatnonzero(table == vi)
        picked = 0
        for cp in cps[:500]:
            cp = int(cp)
            if 0xD800 <= cp <= 0xDFFF:
                continue
            reps.append(cp)
            picked += 1
            if picked >= per_class:
                break
    return np.array(reps)


def test_words_class_pairs():
    reps = _reps(tables.word_break_table(), tables.WB_VALUES)
    bad = []
    for a in reps:
        for b in reps:
            text = chr(int(a)) + chr(int(b))
            if word_segments(text) != ref_word_segments(text):
                bad.append((hex(int(a)), hex(int(b))))
    assert not bad, f"{len(bad)} mismatches: {bad[:8]}"


def test_words_random_soup(rng):
    reps = _reps(tables.word_break_table(), tables.WB_VALUES, per_class=3)
    bad = []
    for _ in range(250):
        n = int(rng.integers(1, 10))
        seq = reps[rng.integers(0, reps.size, n)]
        text = "".join(chr(int(c)) for c in seq)
        if word_segments(text) != ref_word_segments(text):
            bad.append([hex(int(c)) for c in seq])
    assert not bad, f"{len(bad)} mismatches: {bad[:5]}"


def test_words_curated():
    cases = [
        "The quick (“brown”) fox can't jump 32.3 feet, right?",
        "a⁠b",  # word joiner (Format) absorbed
        "1,234.56",
        "don't can't won't",
        "אב'ג",  # Hebrew + single quote
        "א\"ב",  # Hebrew double-quote Hebrew
        "abc_def_123",
        "\U0001F1FA\U0001F1F8\U0001F1EB\U0001F1F7",  # RI pairs
        "A.B. c",
    ]
    for text in cases:
        assert word_segments(text) == ref_word_segments(text), repr(text)


def test_sentences_class_pairs():
    reps = _reps(tables.sentence_break_table(), tables.SB_VALUES)
    bad = []
    for a in reps:
        for b in reps:
            text = chr(int(a)) + chr(int(b))
            if sentence_segments(text) != ref_sentence_segments(text):
                bad.append((hex(int(a)), hex(int(b))))
    assert not bad, f"{len(bad)} mismatches: {bad[:8]}"


def test_sentences_random_soup(rng):
    reps = _reps(tables.sentence_break_table(), tables.SB_VALUES, per_class=2)
    bad = []
    for _ in range(200):
        n = int(rng.integers(1, 9))
        seq = reps[rng.integers(0, reps.size, n)]
        text = "".join(chr(int(c)) for c in seq)
        if sentence_segments(text) != ref_sentence_segments(text):
            bad.append([hex(int(c)) for c in seq])
    assert not bad, f"{len(bad)} mismatches: {bad[:5]}"


def test_sentences_curated():
    cases = [
        "Hello. World.",
        "He said “Stop.” Then left.",
        "Dr. Smith went home. He slept.",
        "Wait... what? Yes! No.",
        "3.14 is pi. True.",
        "One\nTwo\rThree\r\nFour",
        "(a.) b",
        "A. b lower continues",
    ]
    for text in cases:
        assert sentence_segments(text) == ref_sentence_segments(text), repr(text)
