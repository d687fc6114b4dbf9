"""K9 sentence-boundary cases (hand-derived from UAX#29 SB1-SB11)."""

from stringwars_tpu.ops.segment import sentence_segments


def test_basic_sentences():
    assert sentence_segments("Hello world. How are you? Fine!") == [
        "Hello world. ",
        "How are you? ",
        "Fine!",
    ]


def test_sb6_aterm_numeric():
    # ATerm x Numeric: no break inside "3.14".
    assert sentence_segments("Pi is 3.14 roughly. Next.") == [
        "Pi is 3.14 roughly. ",
        "Next.",
    ]


def test_sb7_abbreviation_upper():
    # SB7 joins only the *internal* dots of "U.S." ((Upper) ATerm x Upper,
    # no space between); after "U.S. " + Upper the default rules DO break —
    # the spec's documented behavior for the default (untailored) grammar.
    assert sentence_segments("The U.S. Government acted. Then.") == [
        "The U.S. ",
        "Government acted. ",
        "Then.",
    ]
    # Internal dot: no break between "U." and "S".
    assert sentence_segments("U.S.A. rocks") == ["U.S.A. rocks"]


def test_sb8_lowercase_continuation():
    # ATerm Close* Sp* x (...)* Lower: "etc. and" continues the sentence.
    assert sentence_segments("We bought apples, pears, etc. and left. Done.") == [
        "We bought apples, pears, etc. and left. ",
        "Done.",
    ]


def test_sb9_close_after_terminator():
    # SATerm Close* x Close: closing paren/quote attaches to the sentence.
    assert sentence_segments('He said "Stop!" Then silence.') == [
        'He said "Stop!" ',
        "Then silence.",
    ]


def test_sb4_paragraph_separators():
    assert sentence_segments("One\nTwo") == ["One\n", "Two"]
    assert sentence_segments("A\r\nB") == ["A\r\n", "B"]


def test_multiple_terminators():
    assert sentence_segments("Wait... What?! Yes.") == ["Wait... ", "What?! ", "Yes."]


def test_no_terminator_single_sentence():
    assert sentence_segments("no terminator here at all") == ["no terminator here at all"]


def test_empty():
    assert sentence_segments("") == []
