"""Golden tests for formatting (reference: src/format.rs tests + doctests)."""

from kbo_tpu.ops.format import RLE, relative_to_ref, run_lengths, run_lengths_gapped
from kbo_tpu.ops.translate import translate_ms_vec


def test_run_lengths_doctest():
    # reference: src/format.rs:76-96
    aln = list("XMMRRMMXMMM--MMM--")
    expected = [
        RLE(start=0, end=11, matches=9, mismatches=2, jumps=1, gap_bases=0, gap_opens=0),
        RLE(start=13, end=16, matches=3, mismatches=0, jumps=0, gap_bases=0, gap_opens=0),
    ]
    assert run_lengths(aln) == expected


def test_run_lengths_gapped_doctest():
    # reference: src/format.rs:120-141
    aln = list("XMMRRMMXMMM--MMM--")
    expected = [
        RLE(start=0, end=16, matches=12, mismatches=2, jumps=1, gap_bases=2, gap_opens=1)
    ]
    assert run_lengths_gapped(aln, 3) == expected


def test_run_lengths_512():
    # reference: src/format.rs:294-330 (512-char alignment)
    aln = (
        "-" * 5 + "M" * 28 + "-" * 48 + "M" * 126 + "-" * 165 + "M" * 51
        + "-" * 64 + "M" * 25
    )
    assert len(aln) == 512
    expected = [
        RLE(start=5, end=33, matches=28),
        RLE(start=81, end=207, matches=126),
        RLE(start=372, end=423, matches=51),
        RLE(start=487, end=512, matches=25),
    ]
    assert run_lengths(list(aln)) == expected


def test_run_lengths_gapped_backout_overflow():
    # A dash run longer than max_gap_len terminates the segment and is
    # backed out of its totals (src/format.rs:180-184); the tail after the
    # run becomes its own segment.
    aln = list("MMM----MM")
    assert run_lengths_gapped(aln, 3) == [
        RLE(start=0, end=3, matches=3, mismatches=0, jumps=0,
            gap_bases=0, gap_opens=0),
        RLE(start=7, end=9, matches=2, mismatches=0, jumps=0,
            gap_bases=0, gap_opens=0),
    ]


def test_run_lengths_gapped_backout_trailing_dashes():
    # Input ending inside a tolerated dash run: the trailing run is backed
    # out even though it never overflowed.
    aln = list("MMMM--")
    assert run_lengths_gapped(aln, 5) == [
        RLE(start=0, end=4, matches=4, mismatches=0, jumps=0,
            gap_bases=0, gap_opens=0)
    ]


def test_run_lengths_gapped_backout_trailing_d_stale_run():
    # Reference quirk (src/format.rs:161-184): the dash counter resets only
    # when a NEW dash run opens, so an input ending on 'D' after an earlier
    # dash run backs out the PREVIOUS run's dash count (here 2) while the
    # 'D' itself stays counted in gap_bases (3 D's + 2 dashes - 2 = 3).
    aln = list("MM--MDDD")
    assert run_lengths_gapped(aln, 4) == [
        RLE(start=0, end=5, matches=3, mismatches=0, jumps=0,
            gap_bases=3, gap_opens=0)
    ]


def test_run_lengths_gapped_trailing_d_without_gap_open():
    # Ending on 'D' with no prior dash run: gap_opens == 0, so no back-out.
    aln = list("MMDD")
    assert run_lengths_gapped(aln, 4) == [
        RLE(start=0, end=2, matches=2, mismatches=0, jumps=0,
            gap_bases=2, gap_opens=0)
    ]


def test_relative_to_ref_unrefined():
    # reference: src/format.rs:225-247
    reference = b"TTGATTGGCTGGGCAGAGCTG"
    derand_ms = [1, 2, 3, 4, -1, 0, 1, 2, 3, 4, 4, 4, 4, 0, 1, 2, 3, 4, 4, 4, 4]
    translated = translate_ms_vec(derand_ms, 4, 3)
    got = relative_to_ref(reference, translated)
    assert got == b"TTGA--GGCTGGG-AGAGCTG"


def test_relative_to_ref_refined():
    # reference: src/format.rs:249-264
    reference = b"AAAGAACCATCAGGGCG"
    refined = list("CMMR--RMMMMMMMM--")
    got = relative_to_ref(reference, refined)
    assert got == b"CAAG--CCATCAGGG--"
