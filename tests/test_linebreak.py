"""K9 UAX#14 line-break opportunity cases (hand-derived, core rules)."""

from stringwars_tpu.ops.segment import line_break_positions


def test_spaces_break_after():
    assert line_break_positions("hello world foo") == [6, 12]


def test_hyphen_break_after():
    assert line_break_positions("foo-bar baz") == [4, 8]


def test_mandatory_newline():
    assert line_break_positions("a\nb c") == [2, 4]


def test_no_break_inside_parens():
    assert line_break_positions("(word) x") == [7]


def test_number_chain_kept():
    assert line_break_positions("3.14 ok") == [5]
    assert line_break_positions("$1,234.56 x") == [10]


def test_nonbreaking_glue():
    # U+00A0 (GL): no break around it.
    assert line_break_positions("a b c") == [4]


def test_zero_width_space_breaks():
    assert line_break_positions("ab​cd") == [3]


def test_cjk_breaks_anywhere():
    # ID class: breaks between ideographs.
    assert line_break_positions("漢字文") == [1, 2]


def test_empty_and_single():
    assert line_break_positions("") == []
    assert line_break_positions("x") == []
