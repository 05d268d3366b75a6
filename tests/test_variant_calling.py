"""Golden scenario tests for variant calling
(reference: src/variant_calling.rs:296-555)."""

import numpy as np

from kbo_tpu import BuildOpts, build
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.ops.ms import query_ms_codes
from kbo_tpu.refine.variant_calling import Variant, call_variants, resolve_variant


def run_variant_calling(query, reference, k, p_value):
    sbwt_ref = build([reference], BuildOpts(k=k, build_select=True))
    sbwt_query = build([query], BuildOpts(k=k, build_select=True))
    return call_variants(sbwt_ref, sbwt_query, query, p_value)


def test_resolve_variant_doctest():
    # reference: src/variant_calling.rs:107-137
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCTTCAACGTG"
    k, threshold = 20, 5
    sbwt_ref = build([reference], BuildOpts(k=k, build_select=True))
    sbwt_query = build([query], BuildOpts(k=k, build_select=True))
    ms_vs_ref, _ = query_ms_codes(sbwt_ref, encode_ascii(query))
    ms_vs_query, _ = query_ms_codes(sbwt_query, encode_ascii(reference))
    qc, rc = resolve_variant(query, reference, ms_vs_query, ms_vs_ref, threshold)
    assert qc == b"T" and rc == b"A"


def test_single_base_substitution():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCTTCAACGTG"
    variants = run_variant_calling(query, reference, 20, 0.001)
    assert variants == [Variant(query_pos=49, query_chars=b"T", ref_chars=b"A")]


def test_multi_base_substitution():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAGCGTCTATTGTACCAATCGGCATCAACGTG"
    variants = run_variant_calling(query, reference, 30, 0.001)
    assert variants == [Variant(query_pos=29, query_chars=b"GCG", ref_chars=b"AA")]


def test_multi_base_insertion_non_overlap_case():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATATCTATTGTACCAATCGGCATCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAGCGTCTATTGTACCAATCGGCATCAACGTG"
    variants = run_variant_calling(query, reference, 30, 0.001)
    assert variants == [Variant(query_pos=29, query_chars=b"GCG", ref_chars=b"")]


def test_multi_base_insertion_overlap_case():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAAAAAATCTATTGTACCAATCGGCATCAACGTG"
    variants = run_variant_calling(query, reference, 30, 0.001)
    assert variants == [Variant(query_pos=31, query_chars=b"AAAA", ref_chars=b"")]


def test_single_base_insertion_non_overlap_case():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCAGTCAACGTG"
    variants = run_variant_calling(query, reference, 20, 0.001)
    assert variants == [Variant(query_pos=50, query_chars=b"G", ref_chars=b"")]


def test_single_base_insertion_overlap_case():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCAATCAACGTG"
    variants = run_variant_calling(query, reference, 20, 0.001)
    assert variants == [Variant(query_pos=50, query_chars=b"A", ref_chars=b"")]


def test_single_base_deletion_non_overlap_case():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCAGTCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATCAACGTG"
    variants = run_variant_calling(query, reference, 20, 0.001)
    assert variants == [Variant(query_pos=50, query_chars=b"", ref_chars=b"G")]


def test_single_base_deletion_overlap_case():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATTCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATCAACGTG"
    variants = run_variant_calling(query, reference, 20, 0.001)
    assert variants == [Variant(query_pos=51, query_chars=b"", ref_chars=b"T")]


def test_multi_base_deletion_non_overlap_case():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAGCGTCTATTGTACCAATCGGCATCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATATCTATTGTACCAATCGGCATCAACGTG"
    variants = run_variant_calling(query, reference, 30, 0.001)
    assert variants == [Variant(query_pos=29, query_chars=b"", ref_chars=b"GCG")]


def test_multi_base_deletion_overlap_case():
    reference = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAAAAAATCTATTGTACCAATCGGCATCAACGTG"
    query = b"GCGGGGCTGTTGACGTTTGGGGTTGAATAAATCTATTGTACCAATCGGCATCAACGTG"
    variants = run_variant_calling(query, reference, 30, 0.001)
    assert variants == [Variant(query_pos=31, query_chars=b"", ref_chars=b"AAAA")]


def test_variants_in_same_query():
    reference = b"TCGTGGATCGATACACGCTAGCAGGCTGACTCGATGGGATACTATGTGTTATAGCAATTCGGATCGATCGA"
    query = b"TCGTGGATCGATACACGCTAGCAGCTGACTCGATGGGATACCATGTGTTATAGCAATTCCGGATCGATCGA"
    variants = run_variant_calling(query, reference, 20, 0.001)
    assert variants[0] == Variant(query_pos=24, query_chars=b"", ref_chars=b"G")
    assert variants[1] == Variant(query_pos=41, query_chars=b"C", ref_chars=b"T")
    assert variants[2] == Variant(query_pos=59, query_chars=b"C", ref_chars=b"")
    assert len(variants) == 3


def test_call_vs_seq_device_path():
    """The index-free device call path (k-mer joins directly against the
    reference sequence's window keys) produces identical variants to the
    host build-an-index path."""
    import os

    import numpy as np

    from kbo_tpu import BuildOpts, CallOpts, build, call

    rng = np.random.default_rng(21)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n = 8000
    query = bases[rng.integers(0, 4, n)].tobytes()
    ref = bytearray(query)
    ref[2000] = bases[(np.frombuffer(query[2000:2001], np.uint8)[0] % 4 + 1) % 4]
    del ref[5000:5002]
    ref[6500:6500] = b"TT"
    ref = bytes(ref)

    opts_b = BuildOpts(k=51, build_select=True)
    sbwt_q = build([query], opts_b)
    opts = CallOpts(sbwt_build_opts=opts_b)

    got = call(sbwt_q, ref, opts)  # auto backend: vs-seq device path
    os.environ["KBO_TPU_BACKEND"] = "host"
    try:
        want = call(sbwt_q, ref, opts)
    finally:
        del os.environ["KBO_TPU_BACKEND"]
    assert [(v.query_pos, v.query_chars, v.ref_chars) for v in got] == [
        (v.query_pos, v.query_chars, v.ref_chars) for v in want
    ]
    assert len(got) == 3
