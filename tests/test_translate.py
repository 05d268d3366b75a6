"""Golden tests for translation (reference: src/translate.rs tests + doctests)."""

import pytest

from kbo_tpu.ops.translate import translate_ms_val, translate_ms_vec


@pytest.mark.parametrize(
    "curr,nxt,prev,thr,expected",
    [
        (3, 1, 2, 2, ("R", "R")),   # deletion        (src/translate.rs:396-410)
        (3, 1, 3, 2, ("R", "R")),   # recombination   (src/translate.rs:413-427)
        (0, 1, 3, 2, ("X", " ")),   # mismatch        (src/translate.rs:430-444)
        (-1, 0, 3, 2, ("-", " ")),  # many insertions (src/translate.rs:467-481)
        (1, 2, 3, 2, ("M", " ")),   # only matches    (src/translate.rs:484-498)
    ],
)
def test_translate_ms_val(curr, nxt, prev, thr, expected):
    assert translate_ms_val(curr, nxt, prev, thr) == expected


def test_translate_ms_vec():
    # reference: src/translate.rs:500-515
    ms = [0, 1, 2, 3, 1, 2, 3, 0, 1, 2, 3, -1, 0, 1, 2, 3, -1, 0]
    expected = list("XMMRRMMXMMM--MMM--")
    assert translate_ms_vec(ms, 3, 2) == expected


def test_translate_ms_vec_with_recombination():
    # reference: src/translate.rs:517-532
    ms = [1, 2, 3, 1, 2, 3, 3, 3, 3, 1, 2, 3]
    expected = list("MMRRMMMMRRMM")
    assert translate_ms_vec(ms, 3, 2) == expected
