"""Golden scenario tests for gap filling (reference: src/gap_filling.rs tests)."""

from kbo_tpu import BuildOpts, build
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.ops.derandomize import derandomize_ms_vec, random_match_threshold
from kbo_tpu.ops.ms import query_ms_codes
from kbo_tpu.ops.translate import translate_ms_vec
from kbo_tpu.refine.gap_filling import (
    fill_gaps,
    left_extend_kmer,
    left_extend_over_gap,
    nearest_unique_context,
)


def _pipeline(query, reference, k, threshold, build_select=True):
    sbwt = build([query], BuildOpts(k=k, build_select=build_select))
    noisy_ms, ivals = query_ms_codes(sbwt, encode_ascii(reference))
    derand = derandomize_ms_vec(noisy_ms, sbwt.k, threshold)
    translated = translate_ms_vec(derand, sbwt.k, threshold)
    return sbwt, noisy_ms, ivals, translated


def test_nearest_unique_context():
    # reference: src/gap_filling.rs:534-564
    reference = b"TTGATTAACAGGCAGCTCAGAGCTG"
    query = b"TTGATGTACAGACAGCTGAGAGCTG"
    sbwt = build([query], BuildOpts(k=9, build_select=True))
    _, ivals = query_ms_codes(sbwt, encode_ascii(reference))
    idx, kmer = nearest_unique_context(ivals, sbwt, 11, 16)
    assert (idx, kmer) == (16, b"CAGACAGCT")


def test_nearest_unique_context_doctest():
    # reference: src/gap_filling.rs:91-125
    query = b"TTGAACAGGCTGCGTAGAGCTG"
    reference = b"TTGATCTGGCTGCTGAGAGCTG"
    sbwt = build([query], BuildOpts(k=7, build_select=True))
    _, ivals = query_ms_codes(sbwt, encode_ascii(reference))
    idx, kmer = nearest_unique_context(ivals, sbwt, 8, 14)
    assert (idx, kmer) == (12, b"AGGCTGC")


def test_left_extend_kmer():
    # reference: src/gap_filling.rs:566-600
    sequence = b"TTGATGTACAGACTGCGGAGAGCTG"
    sbwt = build([sequence], BuildOpts(k=6, build_select=True))
    interval = sbwt.search_codes(encode_ascii(b"GACTGC"))
    kmer = sbwt.access_kmer(interval[0])
    extended = left_extend_kmer(kmer, sbwt, 8)
    assert extended == b"GATGTACAGACTGC"


def test_left_extend_kmer_doctest():
    # reference: src/gap_filling.rs:168-204
    sequence = b"TTGAACAGGCTGCCGTAACAGG"
    sbwt = build([sequence], BuildOpts(k=7, build_select=True))
    extended = left_extend_kmer(b"AGGCTGC", sbwt, 5)
    assert extended == b"AACAGGCTGC"


def test_left_extend_over_gap():
    # reference: src/gap_filling.rs:602-638
    reference = b"TTGAACAGGCTGCGCAGAGCTG"
    query = b"TTGATCTGGCTGCGGAGAGCTG"
    sbwt = build([query], BuildOpts(k=5, build_select=True))
    _, ivals = query_ms_codes(sbwt, encode_ascii(reference))
    overlap_seq = left_extend_over_gap(ivals, reference, sbwt, 3, 3, 4, 7, 4)
    assert overlap_seq == b"TGATCTGGC"


def test_left_extend_over_gap_doctest():
    # reference: src/gap_filling.rs:258-293
    reference = b"TTGATTAACAGGCTGCGCAGAGCTG"
    query = b"TTGATGTACAGACTGCGGAGAGCTG"
    sbwt = build([query], BuildOpts(k=9, build_select=True))
    _, ivals = query_ms_codes(sbwt, encode_ascii(reference))
    overlap_seq = left_extend_over_gap(ivals, reference, sbwt, 4, 4, 5, 12, 6)
    assert overlap_seq == b"TGATGTACAGACTGC"


def test_fill_gaps():
    # reference: src/gap_filling.rs:640-681
    query = b"TTGAGGCTGGGGAGAGCTG"
    reference = b"TTGATTGGCTGGGCAGAGCTG"
    sbwt, noisy_ms, ivals, translated = _pipeline(query, reference, 7, 3)
    refined = fill_gaps(translated, noisy_ms, ivals, reference, sbwt, 3, 0.001)
    assert refined == list("MMMM--MMMMMMMGMMMMMMM")


def test_fill_gaps_doctest():
    # reference: src/gap_filling.rs:400-442
    query = b"TTGATGTACAGACTGCGGAGAGCTG"
    reference = b"TTGATTAACAGGCTGCGCAGAGCTG"
    sbwt, noisy_ms, ivals, translated = _pipeline(query, reference, 9, 4)
    refined = fill_gaps(translated, noisy_ms, ivals, reference, sbwt, 4, 0.001)
    assert refined == list("MMMMMGTMMMMAMMMMMGMMMMMMM")


def test_fill_gaps_with_clustered_changes():
    # reference: src/gap_filling.rs:684-725
    query = b"TTGATCTGGCTGCGGAGAGCTG"
    reference = b"TTGAACAGGCTGCGCAGAGCTG"
    sbwt, noisy_ms, ivals, translated = _pipeline(query, reference, 9, 3)
    refined = fill_gaps(translated, noisy_ms, ivals, reference, sbwt, 3, 0.001)
    assert refined == list("MMMMTMTMMMMMMMGMMMMMMM")


def test_fill_gaps_with_clustered_changes2():
    # reference: src/gap_filling.rs:727-769 (ambiguous -> partially unresolved)
    query = b"TTGGGCTGGCTGGGGAGAGCTG"
    reference = b"TTGGACAGGCTGGGCAGAGCTG"
    sbwt, noisy_ms, ivals, translated = _pipeline(query, reference, 9, 3)
    refined = fill_gaps(translated, noisy_ms, ivals, reference, sbwt, 3, 0.001)
    assert refined == list("MMMMGMTMMMMMMMRRMMMMMM")


def test_fill_gaps_left_extend_short():
    # reference: src/gap_filling.rs:771-813
    query = b"TTGATCAGACTGCGGAGAGCTG"
    reference = b"TTGAACAGGCTGCGCAGAGCTG"
    sbwt, noisy_ms, ivals, translated = _pipeline(query, reference, 9, 3)
    refined = fill_gaps(translated, noisy_ms, ivals, reference, sbwt, 3, 0.001)
    assert refined == list("MMMMTMMMAMMMMMGMMMMMMM")


def test_fill_gaps_left_extend_long():
    # reference: src/gap_filling.rs:815-855
    query = b"TTGATGTACAGACTGCGGAGAGCTG"
    reference = b"TTGATTAACAGGCTGCGCAGAGCTG"
    sbwt, noisy_ms, ivals, translated = _pipeline(query, reference, 9, 4)
    refined = fill_gaps(translated, noisy_ms, ivals, reference, sbwt, 4, 0.001)
    assert refined == list("MMMMMGTMMMMAMMMMMGMMMMMMM")


def test_soft_masked_reference_rejects_fill():
    """Overlap counting runs in RAW ASCII space (reference:
    src/gap_filling.rs:20-67, :484-488): lowercase (soft-masked)
    reference bases never match the index's uppercase k-mer bytes, so a
    fill that succeeds on the uppercase reference must be rejected when
    its flanks are soft-masked."""
    import numpy as np

    from kbo_tpu import BuildOpts, MapOpts, build
    from kbo_tpu.api import map_

    rng = np.random.default_rng(12)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n, k = 4000, 31
    query = bytearray(bases[rng.integers(0, 4, n)].tobytes())
    # the REFERENCE diverges from the query in a short cluster: the gap
    # filler recovers the query's bases there from a spanning k-mer
    ref_up = bytearray(query)
    for p in (2000, 2001, 2002):
        ref_up[p] = bases[(bases.tolist().index(ref_up[p]) + 1) % 4]
    bo = BuildOpts(k=k, build_select=True)
    idx = build([bytes(query)], bo)
    opts = MapOpts(call_variants=False, format=False, sbwt_build_opts=bo)

    up = map_(bytes(ref_up), idx, opts)
    window = slice(1995, 2010)
    # uppercase: the divergent cluster gets filled (query nucleotides)
    assert b"-" not in up[window] and b"X" not in up[window], up[window]

    # soft-mask the right flank the filler's unique context must overlap
    ref_soft = bytearray(ref_up)
    ref_soft[2003:2060] = bytes(ref_up[2003:2060]).lower()
    soft = map_(bytes(ref_soft), idx, opts)
    # soft-masked: overlap counting never matches lowercase -> rejected
    assert soft[window] != up[window]
    assert b"-" in soft[window] or b"X" in soft[window], soft[window]
