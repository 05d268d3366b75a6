"""Seeded multi-config fuzz: device engine vs host oracle.

Each config randomizes k, threshold, contig count, mutation mix (SNPs,
indels, soft-masked runs, N runs, fragment boundaries) and checks the
device sort-join pipeline (kernels/ms.py via pipeline.matches_batch)
against the scalar host oracle (ops/ms.py -> ops/derandomize.py ->
ops/translate.py) for bit-exact chars at every position. This is the
suite's broad-spectrum safety net on top of the targeted golden tests;
the host oracle mirrors the reference semantics (SURVEY §7.3).
"""

import numpy as np
import pytest

from kbo_tpu import BuildOpts, build
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.ops.derandomize import derandomize_ms_vec, random_match_threshold
from kbo_tpu.ops.ms import query_ms_codes
from kbo_tpu.ops.translate import translate_ms_vec
from kbo_tpu.pipeline import matches_ms_batch

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
KS = [7, 15, 21, 31, 41, 63]


def _n_run(rng, seq: bytearray):
    p = int(rng.integers(0, len(seq) - 20))
    ln = int(rng.integers(1, 12))
    seq[p : p + ln] = b"N" * ln
    return seq


@pytest.mark.parametrize("seed", range(12))
def test_matches_device_vs_host_oracle(seed):
    rng = np.random.default_rng([seed, 991])
    n = int(rng.integers(1500, 6000))
    genome = BASES[rng.integers(0, 4, n)].tobytes()
    k = int(rng.choice(KS))

    # index side: 1-3 contigs cut from the genome (fragment boundaries
    # exercise the '$'-separator rows)
    n_contigs = int(rng.integers(1, 4))
    cuts = sorted(rng.integers(k + 2, n - k - 2, n_contigs - 1).tolist())
    contigs = [
        genome[a:b]
        for a, b in zip([0] + cuts, cuts + [n])
    ]
    index = build(contigs, BuildOpts(k=k))

    # streamed side: mutated copy of the genome
    seq = bytearray(genome)
    snp_rate = float(rng.choice([0.002, 0.01, 0.05]))
    for p in np.nonzero(rng.random(n) < snp_rate)[0]:
        seq[p] = BASES[rng.integers(0, 4)]
    for _ in range(int(rng.integers(0, 4))):
        p = int(rng.integers(50, len(seq) - 60))
        ln = int(rng.integers(1, 6))
        if rng.random() < 0.5:
            del seq[p : p + ln]
        else:
            seq[p:p] = BASES[rng.integers(0, 4, ln)].tobytes()
    if rng.random() < 0.5:
        p = int(rng.integers(0, len(seq) - 40))
        seq[p : p + 30] = bytes(seq[p : p + 30]).lower()
    if rng.random() < 0.5:
        _n_run(rng, seq)
    seq = bytes(seq)

    thr_cap = max(2, k - 1)
    threshold = min(
        thr_cap,
        max(2, random_match_threshold(k, index.n_kmers, 4, 1e-7)),
    )

    codes = encode_ascii(seq)
    got_chars, got_ms = matches_ms_batch(index, [codes], threshold)

    want_ms, _ = query_ms_codes(index, codes)
    derand = derandomize_ms_vec(want_ms, k, threshold)
    want_chars = translate_ms_vec(derand, k, threshold)

    np.testing.assert_array_equal(
        got_ms[0], np.asarray(want_ms),
        err_msg=f"seed={seed} k={k} thr={threshold} L={len(seq)}",
    )
    assert [chr(c) for c in got_chars[0]] == want_chars, (
        f"seed={seed} k={k} thr={threshold} L={len(seq)}"
    )


@pytest.mark.parametrize("seed", range(6))
def test_find_device_rle_vs_host(seed):
    """find_batch's device RLE extraction == host run_lengths on the
    fetched chars, across random mutation configs."""
    from kbo_tpu import FindOpts
    from kbo_tpu.api import find_batch
    from kbo_tpu.ops.format import run_lengths
    from kbo_tpu.pipeline import matches_batch

    rng = np.random.default_rng([seed, 313])
    n = int(rng.integers(1200, 5000))
    genome = BASES[rng.integers(0, 4, n)].tobytes()
    k = int(rng.choice([15, 31, 51]))
    index = build([genome], BuildOpts(k=k))
    queries = []
    for _ in range(5):
        ln = int(rng.integers(200, 1100))
        s = int(rng.integers(0, n - ln))
        q = bytearray(genome[s : s + ln])
        for p in np.nonzero(rng.random(ln) < 0.02)[0]:
            q[p] = BASES[rng.integers(0, 4)]
        queries.append(bytes(q))

    got = find_batch(queries, index, FindOpts())
    thr = random_match_threshold(k, index.n_kmers, 4, 1e-7)
    chars_list = matches_batch(index, [encode_ascii(q) for q in queries], thr)
    for g, chars in zip(got, chars_list):
        want = run_lengths(chars)
        assert len(g) == len(want), (seed, k)
        for a, b in zip(g, want):
            assert (a.start, a.end, a.matches, a.mismatches, a.jumps,
                    a.gap_bases, a.gap_opens) == (
                b.start, b.end, b.matches, b.mismatches, b.jumps,
                b.gap_bases, b.gap_opens), (seed, k, a, b)
