"""Threshold sweep + gap filling on low-identity queries (BASELINE.json
configs[3]).

Drives the derandomization threshold across max_error_prob values on a
query pair at ~95% identity and checks the statistical model's monotone
behavior plus end-to-end map/find output invariants at every point of the
sweep. The threshold formula is the reference's
``random_match_threshold`` (reference: src/derandomize.rs:127-145, built
on log_rm_max_cdf src/derandomize.rs:91-100); gap filling's acceptance
test reuses the same cdf per run (src/gap_filling.rs:491-506), so a sweep
exercises both ends of the model.
"""

import numpy as np
import pytest

from kbo_tpu import BuildOpts, FindOpts, MapOpts, build, find, map_
from kbo_tpu.ops.derandomize import log_rm_max_cdf, random_match_threshold

K = 31
PROBS = [1e-10, 1e-7, 1e-4, 1e-2]


def _low_identity_pair(n=20_000, snp_every=20, seed=5):
    """Reference + ~95%-identity query (dense SNPs, one 2bp deletion)."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, n)]
    q = ref.copy()
    for p in range(snp_every // 2, n - snp_every, snp_every):
        alt = bases[(np.searchsorted(bases, q[p]) + 1 + rng.integers(0, 3)) % 4]
        q[p] = alt
    q = np.delete(q, slice(n // 2, n // 2 + 2))
    return ref.tobytes(), q.tobytes()


def test_threshold_monotone_in_error_prob():
    # a larger tolerated error probability can only lower the threshold
    n_kmers = 1_000_000
    ts = [random_match_threshold(K, n_kmers, 4, p) for p in PROBS]
    assert all(1 <= t <= K for t in ts)
    assert ts == sorted(ts, reverse=True), ts
    assert ts[0] > ts[-1]  # the sweep actually moves on real-size inputs


def test_threshold_monotone_in_index_size():
    # more k-mers -> more random-match opportunity -> higher threshold
    ts = [random_match_threshold(K, n, 4, 1e-7) for n in (10**3, 10**5, 10**7)]
    assert ts == sorted(ts)


def test_cdf_monotone_in_t():
    # P(longest random match <= t) grows with t (src/derandomize.rs:91-100)
    vals = [log_rm_max_cdf(t, 4, 10**6) for t in range(1, K)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))


@pytest.mark.parametrize("p", PROBS)
def test_map_sweep_low_identity(p):
    """map at ~95% identity stays structurally valid across the sweep."""
    ref, query = _low_identity_pair()
    bo = BuildOpts(k=K, build_select=True)
    idx = build([query], bo)
    mo = MapOpts(max_error_prob=p, sbwt_build_opts=bo)
    aln = map_(ref, idx, mo)
    assert len(aln) == len(ref)
    # output alphabet: reference bases, variant patches, or gaps
    assert set(aln) <= set(b"ACGTN-")
    # at 95% identity with SNPs every 20bp < k apart, no k-mer of the
    # reference appears in the query verbatim: the ~19-base runs between
    # SNPs clear the threshold only when p is loose enough. At the strict
    # end recovering ~nothing is the CORRECT model behavior; at the loose
    # end most of the sequence must come back.
    recovered = sum(a != ord("-") for a in aln)
    threshold = random_match_threshold(K, idx.n_kmers, 4, p)
    if threshold < 19:
        assert recovered > 0.5 * len(ref), (p, threshold, recovered)


def test_map_sweep_threshold_effect():
    """Lower threshold (larger p) never recovers fewer bases: every run
    below a small threshold is also below a larger one, so the accepted
    match set can only grow as p rises."""
    ref, query = _low_identity_pair()
    bo = BuildOpts(k=K, build_select=True)
    idx = build([query], bo)
    recovered = []
    for p in PROBS:
        aln = map_(
            ref, idx,
            MapOpts(
                max_error_prob=p, fill_gaps=False, call_variants=False,
                sbwt_build_opts=bo,
            ),
        )
        recovered.append(sum(a != ord("-") for a in aln))
    assert recovered == sorted(recovered), list(zip(PROBS, recovered))


@pytest.mark.parametrize("p", [1e-7, 1e-2])
def test_find_sweep_low_identity(p):
    """find segments on the low-identity pair: segments are sorted,
    in-bounds, non-overlapping, and cover more at looser thresholds."""
    ref, query = _low_identity_pair()
    bo = BuildOpts(k=K, build_select=True)
    idx = build([query], bo)
    segs = find(ref, idx, FindOpts(max_error_prob=p, max_gap_len=0))
    prev_end = 0
    for s in segs:
        assert 0 <= s.start < s.end <= len(ref)
        assert s.start >= prev_end
        assert s.matches + s.mismatches + s.gap_bases > 0
        prev_end = s.end
