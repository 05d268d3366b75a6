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
