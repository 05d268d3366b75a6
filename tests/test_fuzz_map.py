"""Seeded multi-config fuzz for the END-TO-END map/call pipelines.

The matches-level fuzz (test_fuzz_differential.py) covers the sweep; this
matrix drives the FULL ``map_`` product — sweep + gap filling + variant
calling + formatting — across randomized k, error probability, mutation
mix (SNPs, indels, N runs, soft-masking), fragmented indexes, fragmented
map inputs and revcomp indexes, and checks the on-device refinement path
byte-for-byte against the packed-fetch host-refinement path (which the
targeted tests pin to the host oracle and the reference doctests). This
mirrors the reference's strongest oracle pattern — the seeded generated
test of src/variant_calling.rs:467-553 — applied to the whole pipeline
(round-4 verdict item 7).
"""

import os

import numpy as np
import pytest

from kbo_tpu import BuildOpts, CallOpts, MapOpts, build
from kbo_tpu import api

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _mutate(rng, genome: bytes, snp_rate: float, n_indels: int,
            n_runs: bool, soft: bool) -> bytes:
    seq = bytearray(genome)
    n = len(seq)
    for p in np.nonzero(rng.random(n) < snp_rate)[0]:
        seq[p] = BASES[rng.integers(0, 4)]
    for _ in range(n_indels):
        p = int(rng.integers(100, len(seq) - 110))
        ln = int(rng.integers(1, 5))
        if rng.random() < 0.5:
            del seq[p : p + ln]
        else:
            seq[p:p] = BASES[rng.integers(0, 4, ln)].tobytes()
    if soft:
        p = int(rng.integers(0, len(seq) - 60))
        seq[p : p + 40] = bytes(seq[p : p + 40]).lower()
    if n_runs:
        p = int(rng.integers(0, len(seq) - 30))
        ln = int(rng.integers(2, 9))
        seq[p : p + ln] = b"N" * ln
    return bytes(seq)


def _config(seed):
    """One randomized end-to-end configuration (deterministic per seed)."""
    rng = np.random.default_rng([seed, 7717])
    n = int(rng.integers(4000, 11000))
    genome = BASES[rng.integers(0, 4, n)].tobytes()
    k = int(rng.choice([31, 41, 51, 63]))
    p_err = float(rng.choice([1e-7, 1e-5, 1e-3]))
    add_revcomp = bool(rng.random() < 0.25)

    # index side: the mutated QUERY, possibly fragmented (the '$' rows)
    query = _mutate(
        rng, genome,
        snp_rate=float(rng.choice([0.001, 0.004, 0.02])),
        n_indels=int(rng.integers(0, 4)),
        n_runs=bool(rng.random() < 0.3),
        soft=bool(rng.random() < 0.3),
    )
    if rng.random() < 0.4:
        cut = int(rng.integers(len(query) // 3, 2 * len(query) // 3))
        q_contigs = [query[:cut], query[cut:]]
    else:
        q_contigs = [query]

    # map input: the reference, possibly split into several contigs
    n_ref = int(rng.integers(1, 4))
    cuts = sorted(
        rng.integers(k + 50, n - k - 50, n_ref - 1).tolist()
    )
    ref_contigs = [
        genome[a:b] for a, b in zip([0] + cuts, cuts + [n])
    ]

    bo = BuildOpts(k=k, build_select=True, add_revcomp=add_revcomp)
    mo = MapOpts(max_error_prob=p_err)
    # revcomp inner indexes run the devref variant path too: the
    # rk-vs-seq join table extends with the reverse-complement windows
    # (the reference's both-strand inner index, src/lib.rs:553)
    mo.sbwt_build_opts = bo
    return q_contigs, ref_contigs, bo, mo, p_err, k


@pytest.mark.parametrize("seed", range(12))
def test_map_e2e_device_vs_host_refinement(seed):
    q_contigs, ref_contigs, bo, mo, p_err, k = _config(seed)
    index = build(q_contigs, bo)
    env = os.environ
    try:
        env["KBO_TPU_MAP_DEVREF"] = "0"
        host = api.map_batch(list(ref_contigs), index, mo)
        env["KBO_TPU_MAP_DEVREF"] = "1"
        dev = api.map_batch(list(ref_contigs), index, mo)
    finally:
        env.pop("KBO_TPU_MAP_DEVREF", None)
    assert dev == host, (
        f"seed={seed} k={k} p={p_err} refs={len(ref_contigs)} "
        f"contigs={len(q_contigs)} revcomp={bo.add_revcomp}"
    )
    assert sum(len(r) for r in dev) == sum(len(r) for r in ref_contigs)


@pytest.mark.parametrize("seed", range(6))
def test_call_e2e_device_vs_host_refinement(seed):
    # variant calling end-to-end across the same randomized configs
    # (k >= 2*threshold + len is the reference's own resolvable regime;
    # smaller k simply yields fewer calls on both sides)
    q_contigs, ref_contigs, bo, mo, p_err, k = _config(seed)
    if bo.add_revcomp:
        pytest.skip("call asserts forward-text inner indexes")
    index = build(q_contigs, bo)
    co = CallOpts(max_error_prob=p_err, sbwt_build_opts=bo)
    ref = ref_contigs[0]
    env = os.environ
    try:
        env["KBO_TPU_MAP_DEVREF"] = "0"
        host = api.call(index, ref, co)
        env["KBO_TPU_MAP_DEVREF"] = "1"
        dev = api.call(index, ref, co)
    finally:
        env.pop("KBO_TPU_MAP_DEVREF", None)
    assert [
        (v.query_pos, v.query_chars, v.ref_chars) for v in dev
    ] == [
        (v.query_pos, v.query_chars, v.ref_chars) for v in host
    ], f"seed={seed} k={k} p={p_err}"
