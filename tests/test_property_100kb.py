"""Seeded 100kb planted-variant property test.

Port of the reference's strongest correctness oracle
(reference: src/variant_calling.rs:467-553): generate a 100,000-base genome
pair with a planted variant every 25 bases (k=63, p=1e-8) and require every
call to match the planted truth. Any seeded RNG is acceptable -- the assertion
is calls == planted truth, not RNG-stream parity (SURVEY §4).
"""

import numpy as np
import pytest

from kbo_tpu import BuildOpts, build

pytestmark = pytest.mark.slow  # 100kb seeded property runs (see CLAUDE.md)
from kbo_tpu.refine.variant_calling import Variant, call_variants

BASES = b"ACGT"


def _rand_nt(rng):
    return BASES[rng.integers(0, 4)]


def generate_pair(rng, n=100_000, variant_spacing=25):
    reference = bytearray()
    query = bytearray()
    true_variants = []
    for i in range(n):
        if variant_spacing < i < n - variant_spacing and i % variant_spacing == 0:
            qlen = rng.integers(0, 4)
            rlen = rng.integers(0, 4)
            while qlen == 0 and rlen == 0:
                qlen = rng.integers(0, 4)
                rlen = rng.integers(0, 4)
            qvar = bytearray(_rand_nt(rng) for _ in range(qlen))
            rvar = bytearray(_rand_nt(rng) for _ in range(rlen))
            while qvar and rvar and (qvar[0] == rvar[0] or qvar[-1] == rvar[-1]):
                qvar[-1] = _rand_nt(rng)
                qvar[0] = _rand_nt(rng)
            true_variants.append(
                Variant(query_pos=len(query), query_chars=bytes(qvar), ref_chars=bytes(rvar))
            )
            reference.extend(rvar)
            query.extend(qvar)
            # pure insertion/deletion: continue with a character mismatching
            # both ends of the inserted sequence to avoid border matches
            ins = rvar if (not qvar and rvar) else (qvar if (qvar and not rvar) else None)
            if ins is not None:
                c = _rand_nt(rng)
                while c == ins[0] or c == ins[-1]:
                    c = _rand_nt(rng)
                query.append(c)
                reference.append(c)
        else:
            c = _rand_nt(rng)
            query.append(c)
            reference.append(c)
    return bytes(reference), bytes(query), true_variants


@pytest.mark.slow
def test_long_generated_testcase():
    rng = np.random.default_rng([123412, 121232])
    reference, query, true_variants = generate_pair(rng)

    k, p_value = 63, 1e-8
    sbwt_ref = build([reference], BuildOpts(k=k, build_select=True))
    sbwt_query = build([query], BuildOpts(k=k, build_select=True))
    calls = call_variants(sbwt_ref, sbwt_query, query, p_value)

    n_correct = sum(
        1
        for tv, cv in zip(true_variants, calls)
        if tv == cv
    )
    # every call must match the planted truth (reference asserts
    # n_calls == n_correct) and nearly all planted variants must be found
    assert len(calls) == n_correct, (
        f"{len(calls)} calls, {n_correct} correct; first mismatch: "
        + str(next(((tv, cv) for tv, cv in zip(true_variants, calls) if tv != cv), None))
    )
    assert len(calls) >= 0.95 * len(true_variants), (
        f"only {len(calls)} of {len(true_variants)} planted variants called"
    )


@pytest.mark.slow
def test_long_map_paint_matches_planted_truth():
    """End-to-end map oracle at scale: with cleanly spaced SNPs and
    deletions the expected output is derivable directly from the planted
    truth -- reference base where the pair agrees, the QUERY base at SNP
    sites (variant calling + add_variants), '-' where the query lost
    bases (reference: src/lib.rs:720-761 pipeline semantics)."""
    from kbo_tpu import MapOpts
    from kbo_tpu.api import map_

    rng = np.random.default_rng([77, 99])
    n, spacing, k = 100_000, 200, 63
    reference = bytearray(BASES[b] for b in rng.integers(0, 4, n))
    # alternate SNPs and 3-base deletions, far enough apart to resolve;
    # deletions excise at the end so earlier edit positions stay valid
    query = bytearray(reference)
    expected = bytearray(reference)
    cut = []
    for j, i in enumerate(range(spacing, n - spacing, spacing)):
        if j % 2 == 0:
            old = query[i]
            new = _rand_nt(rng)
            while new == old:
                new = _rand_nt(rng)
            query[i] = new
            expected[i] = new
        else:
            cut.append(i)
            expected[i : i + 3] = b"---"
    for i in reversed(cut):
        del query[i : i + 3]

    bo = BuildOpts(k=k, build_select=True)
    idx = build([bytes(query)], bo)
    out = map_(bytes(reference), idx, MapOpts(sbwt_build_opts=bo))
    assert len(out) == n

    # deletions are subject to indel placement ambiguity (an equivalent
    # left/right-shifted deletion describes the same edit), so the oracle
    # is alignment-invariant:
    # (a) removing the dashes must reproduce the QUERY exactly (full
    #     coverage: every painted base is the query's base);
    assert bytes(out).replace(b"-", b"") == bytes(query)
    # (b) exactly 3 dashes per planted deletion;
    assert bytes(out).count(b"-") == 3 * len(cut)
    # (c) every dash sits within a few positions of a planted cut;
    dash_pos = np.flatnonzero(np.frombuffer(out, np.uint8) == ord("-"))
    cuts = np.asarray(cut)
    near = np.min(
        np.abs(dash_pos[:, None] - cuts[None, :]), axis=1
    )
    assert near.max(initial=0) <= 6, "a dash strayed from every planted cut"
    # (d) positions away from any edit are untouched reference bases
    snps = np.asarray(
        [i for j, i in enumerate(range(spacing, n - spacing, spacing))
         if j % 2 == 0]
    )
    edits = np.concatenate([cuts, snps])
    away = np.ones(n, dtype=bool)
    for e in edits:
        away[max(0, e - 8) : e + 8] = False
    out_arr = np.frombuffer(out, np.uint8)
    ref_arr = np.frombuffer(bytes(reference), np.uint8)
    np.testing.assert_array_equal(out_arr[away], ref_arr[away])
