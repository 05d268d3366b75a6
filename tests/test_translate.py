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


def _add_variants_pipeline(reference: bytes, query: bytes):
    """The reference's add_variants test harness (src/translate.rs:535-568):
    build query index -> MS of reference -> derandomize (k=20, thr=10) ->
    translate -> call (p=0.001) -> add_variants."""
    from kbo_tpu import BuildOpts, CallOpts, build, call
    from kbo_tpu import engine
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.ops.derandomize import derandomize_ms_vec
    from kbo_tpu.ops.translate import add_variants, translate_ms_vec

    k, threshold = 20, 10
    sbwt_query = build([query], BuildOpts(k=k, build_select=True))
    noisy_ms = engine.compute_ms_values(sbwt_query, encode_ascii(reference))
    derand_ms = derandomize_ms_vec(noisy_ms, k, threshold)
    translated = translate_ms_vec(derand_ms, k, threshold)
    variants = call(
        sbwt_query,
        reference,
        CallOpts(max_error_prob=0.001, sbwt_build_opts=BuildOpts(k=k, build_select=True)),
    )
    return "".join(add_variants(translated, variants))


def test_add_variants():
    # reference: src/translate.rs:535-568 (deletion + substitution + insertion)
    reference = b"TCGTGGATCGATACACGCTAGCAGGCTGACTCGATGGGATACTATGTGTTATAGCAATTCGGATCGATCGA"
    query = b"TCGTGGATCGATACACGCTAGCAGTGACTCGATGGGATACCATGTGTTATAGCAATTCCGGATCGATCGA"
    expected = "MMMMMMMMMMMMMMMMMMMMMMMMDDMMMMMMMMMMMMMMMMCMMMMMMMMMMMMMMMMIIMMMMMMMMMM"
    assert _add_variants_pipeline(reference, query) == expected


def test_add_variants_multi_base_substitution():
    # reference: src/translate.rs:570-604 (unequal lengths -> 'N')
    reference = b"TCGTGGATCGATACACGCTAGCAGGCTGACTCGATGGGATACTATGTGTTATAGCAATTCCGGATCGATCGA"
    query = b"TCGTGGATCGATACACGCTAGCAGGCTGACTCGATGGGATACCCAATGTGTTATAGCAATTCCGGATCGATCGA"
    expected = "MMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMNMMMMMMMMMMMMMMMMMMMMMMMMMMMMM"
    assert _add_variants_pipeline(reference, query) == expected


def test_add_variants_multi_base_substitution_all_same():
    # reference: src/translate.rs:606-640 (unequal lengths, uniform -> base)
    reference = b"TCGTGGATCGATACACGCTAGCAGGCTGACTCGATGGGATACTATGTGTTATAGCAATTCCGGATCGATCGA"
    query = b"TCGTGGATCGATACACGCTAGCAGGCTGACTCGATGGGATACGGGATGTGTTATAGCAATTCCGGATCGATCGA"
    expected = "MMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMGMMMMMMMMMMMMMMMMMMMMMMMMMMMMM"
    assert _add_variants_pipeline(reference, query) == expected


def test_add_variants_clustered_substitutions():
    # reference: src/translate.rs:642-676
    reference = b"TCGTGGATCGATACACGCTAGCAGGCTGACTCGATGGGATACTATGTGTTATAGCAATTCCGGATCGATCGA"
    query = b"TCGTGGATCGATACACGCTAGCAGGCTGACTCGATGGGATACCACGTGTTATAGCAATTCCGGATCGATCGA"
    expected = "MMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMMCACMMMMMMMMMMMMMMMMMMMMMMMMMMM"
    assert _add_variants_pipeline(reference, query) == expected
