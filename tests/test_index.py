"""Golden tests for index construction and MS queries
(reference: src/index.rs tests + doctests)."""

import numpy as np

from kbo_tpu import BuildOpts, build
from kbo_tpu.ops.ms import query_ms


REFERENCE = b"AAAGAACCA-TCAGGGCG"
QUERY = b"CAAGCCACTCATTGGGTC"


def test_build_and_query_sbwt():
    # reference: src/index.rs:261-274 (golden MS vector :238-240)
    sbwt = build([REFERENCE], BuildOpts(k=3))
    ms, _ = query_ms(sbwt, QUERY)
    assert ms.tolist() == [1, 2, 2, 3, 2, 2, 3, 2, 1, 2, 3, 1, 1, 1, 2, 3, 1, 2]


def test_index_counts():
    sbwt = build([REFERENCE], BuildOpts(k=3))
    # 13 distinct ACGT 3-mers across the two segments
    assert sbwt.n_kmers == 13
    # + root $$$ + dummies $$A, $AA, $$T, $TC
    assert sbwt.n_rows == 18
    assert sbwt.k == 3


def test_access_kmer_roundtrip():
    sbwt = build([REFERENCE], BuildOpts(k=3))
    # every full k-mer row should reconstruct to a 3-mer present in a segment
    segs = [b"AAAGAACCA", b"TCAGGGCG"]
    all_kmers = {
        seg[i : i + 3] for seg in segs for i in range(len(seg) - 2)
    }
    got = set()
    for row in range(sbwt.n_rows):
        kmer = sbwt.access_kmer(row)
        if b"$" not in kmer:
            got.add(kmer)
    assert got == all_kmers


def test_search_codes():
    from kbo_tpu.index.encode import encode_ascii

    sbwt = build([REFERENCE], BuildOpts(k=3))
    assert sbwt.search_codes(encode_ascii(b"GGG")) is not None
    assert sbwt.search_codes(encode_ascii(b"GGT")) is None
    l, r = sbwt.search_codes(encode_ascii(b"TCA"))
    assert r - l == 1
    assert sbwt.access_kmer(l) == b"TCA"


def test_intervals_unique_rows():
    sbwt = build([REFERENCE], BuildOpts(k=3))
    ms, ivals = query_ms(sbwt, QUERY)
    # where ms == k the interval is that of a full k-mer
    for i in range(len(QUERY)):
        if ms[i] == 3:
            l, r = ivals[i]
            kmer = sbwt.access_kmer(int(l))
            assert kmer == QUERY[i - 2 : i + 1]
