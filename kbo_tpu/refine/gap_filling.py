"""Gap filling using matching statistics and SBWT interval lookups.

Mirrors the reference module (reference: src/gap_filling.rs):

- :func:`nearest_unique_context` (src/gap_filling.rs:127-151)
- :func:`left_extend_kmer`       (src/gap_filling.rs:205-232)
- :func:`left_extend_over_gap`   (src/gap_filling.rs:295-361)
- :func:`fill_gaps`              (src/gap_filling.rs:444-526)

Gaps are sparse (one per unresolved region), so this host orchestration is
off the hot path; k-mer extraction (`access_kmer`) and the candidate searches
batch naturally on device when needed (SURVEY §7.3).
"""

from __future__ import annotations

import math

import numpy as np

from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.index.sbwt import SbwtIndex
from kbo_tpu.ops.derandomize import log_rm_max_cdf
from kbo_tpu.utils.stats import get_stats


def count_right_overlaps(kmer: bytes, ref_seq: bytes, ref_match_end: int) -> int:
    """Matches between the tail of `kmer` (excluding kmer[0]) and `ref_seq`
    ending at `ref_match_end` (reference: src/gap_filling.rs:20-42)."""
    assert len(kmer) > 0 and len(ref_seq) > 0
    assert len(ref_seq) >= ref_match_end
    kmer_pos = len(kmer) - 1
    ref_pos = ref_match_end - 1
    matches = 0
    while kmer_pos > 0:
        if ref_pos < 0:
            break
        if ref_seq[ref_pos] == kmer[kmer_pos]:
            matches += 1
        else:
            break
        kmer_pos -= 1
        ref_pos -= 1
    return matches


def count_left_overlaps(kmer: bytes, ref_seq: bytes, ref_match_start: int) -> int:
    """Matches between the head of `kmer` and `ref_seq` starting at
    `ref_match_start` (reference: src/gap_filling.rs:44-67)."""
    assert len(kmer) > 0 and len(ref_seq) > 0
    assert len(ref_seq) > ref_match_start
    matches = 0
    for kmer_pos in range(len(kmer)):
        ref_pos = ref_match_start + kmer_pos
        if ref_pos >= len(ref_seq):
            break
        if ref_seq[ref_pos] == kmer[kmer_pos]:
            matches += 1
        else:
            break
    return matches


def nearest_unique_context(
    ivals: np.ndarray, sbwt: SbwtIndex, search_start: int, search_end: int
) -> tuple[int, bytes]:
    """Rightmost position in [search_start, search_end] (inclusive) whose colex
    interval has length 1, and the k-mer text at that row; (search_start - 1,
    b"") if none (reference: src/gap_filling.rs:127-151, range end inclusive).
    """
    assert search_end >= search_start
    assert search_end < len(ivals)
    kmer_idx = search_end
    while kmer_idx >= search_start:
        l, r = int(ivals[kmer_idx, 0]), int(ivals[kmer_idx, 1])
        if r - l == 1:
            return kmer_idx, sbwt.access_kmer(l)
        kmer_idx -= 1
    return kmer_idx, b""


def left_extend_kmer(kmer_start: bytes, sbwt: SbwtIndex, max_extension_len: int) -> bytes:
    """Left-extend a k-mer while exactly one left extension has a unique
    interval (reference: src/gap_filling.rs:205-232)."""
    assert len(kmer_start) > 0
    kmer = bytes(kmer_start)
    left_extension_len = 0
    while left_extension_len < max_extension_len:
        hits = []
        for c in sbwt.alphabet():
            new_kmer = bytes([c]) + kmer[: len(kmer) - (left_extension_len + 1)]
            res = sbwt.search_codes(encode_ascii(new_kmer))
            if res is not None:
                hits.append((new_kmer, res))
        if len(hits) == 1 and hits[0][1][1] - hits[0][1][0] == 1:
            kmer = hits[0][0][:1] + kmer
        else:
            break
        left_extension_len += 1
    return kmer


def left_extend_over_gap(
    ivals: np.ndarray,
    ref_seq: bytes,
    sbwt: SbwtIndex,
    left_overlap_req: int,
    right_overlap_req: int,
    gap_start: int,
    gap_end: int,
    search_radius: int,
) -> bytes:
    """Find (and if needed left-extend) a unique context k-mer spanning the gap
    [gap_start, gap_end) (reference: src/gap_filling.rs:295-361)."""
    k = sbwt.k
    assert len(ivals) == len(ref_seq)
    assert left_overlap_req <= gap_start
    assert right_overlap_req <= len(ref_seq) - gap_end
    assert gap_end > gap_start
    assert gap_end < len(ivals)

    search_start = min(gap_end + search_radius, len(ref_seq) - 1)
    search_end = gap_end + right_overlap_req

    if hasattr(ivals, "prefetch"):  # lazy sparse provider (engine.SparseIntervals)
        ivals.prefetch(range(search_end, search_start + 1))

    kmer = b""
    kmer_idx = search_start
    while kmer_idx >= search_end:
        kmer_idx, kmer = nearest_unique_context(ivals, sbwt, search_end, kmer_idx)
        if kmer:
            # right-overlap check: candidate k-mer tail vs reference
            right_matches_want = search_start - (gap_end - 1) - (search_start - kmer_idx)
            right_matches_got = count_right_overlaps(
                kmer, ref_seq, gap_end + right_matches_want
            )
            ref_start_pos = gap_start - left_overlap_req if gap_start > left_overlap_req else 0
            left_matches_got = count_left_overlaps(kmer, ref_seq, ref_start_pos)
            # no point extending if the k-mer already overlaps the gap to the
            # left but contains no matches
            should_extend = len(kmer) < left_overlap_req + (gap_end - gap_start) + right_matches_got

            if right_matches_got >= min(right_matches_want, k) and left_matches_got >= left_overlap_req:
                start = left_matches_got - left_overlap_req
                end = len(kmer) - (right_matches_got - right_overlap_req)
                return bytes(kmer[start:end])
            elif (
                should_extend
                and right_matches_got >= min(right_matches_want, k)
                and left_matches_got < left_overlap_req
            ):
                left_extend_length = (
                    left_overlap_req + (gap_end - gap_start) + right_matches_got - k
                )
                kmer = left_extend_kmer(kmer, sbwt, left_extend_length)
                lm = count_left_overlaps(kmer, ref_seq, ref_start_pos)
                if lm >= left_overlap_req:
                    start = lm - left_overlap_req
                    end = len(kmer) - (right_matches_got - right_overlap_req)
                    return bytes(kmer[start:end])
            kmer = b""
        kmer_idx -= 1
    return kmer


def fill_gaps(
    translation: list[str],
    noisy_ms: np.ndarray,
    ivals: np.ndarray,
    ref_seq: bytes,
    query_sbwt: SbwtIndex,
    threshold: int,
    max_err_prob: float,
) -> list[str]:
    """Resolve '-'/'X' runs in the translation with query k-mers spanning the
    gap (reference: src/gap_filling.rs:444-526)."""
    n = len(translation)
    assert n > 0
    assert n == len(noisy_ms)
    k = query_sbwt.k
    assert k > 0

    ref_seq = bytes(ref_seq)
    refined = list(translation)
    bound = math.log1p(-max_err_prob)

    # Enumerate gaps upfront (vectorized): filled gaps are painted with
    # 'M'/nucleotides, never '-'/'X', and writes land strictly left of the
    # scan point, so the reference's incremental scan over `refined`
    # (src/gap_filling.rs:466-475) sees exactly the gaps of the ORIGINAL
    # translation: maximal ['-'|'X'] + '-'* blocks with start in
    # [threshold, n - threshold - 1).
    trans_arr = np.frombuffer(
        "".join(translation).encode("latin-1"), dtype=np.uint8
    )
    is_dash = trans_arr == ord("-")
    is_gap_char = is_dash | (trans_arr == ord("X"))
    gaps = []
    lo, hi = threshold, n - threshold - 1
    p = lo
    cand = np.flatnonzero(is_gap_char[lo:hi]) + lo
    for p0 in cand:
        if p0 < p:
            continue
        q = p0 + 1
        while q < n and is_dash[q]:
            q += 1
        gaps.append((int(p0), int(q)))
        p = q
    # one batched interval fetch for every gap's search window up front --
    # a lazy per-gap fetch costs one device round trip per gap (~30ms each
    # through a remote relay; hundreds of gaps at genome scale)
    if hasattr(ivals, "prefetch") and gaps:
        wanted: list[int] = []
        for start_index, run_end in gaps:
            end_index = min(run_end, n - threshold)
            gap_len = end_index - start_index
            overlap_without_extend = gap_len + 2 * threshold <= k
            search_radius = k - (threshold if overlap_without_extend else 0)
            search_start = min(end_index + search_radius, len(ref_seq) - 1)
            search_end = end_index + threshold
            wanted.extend(range(search_end, search_start + 1))
        ivals.prefetch(wanted)

    for start_index, run_end in gaps:
        end_index = min(run_end, n - threshold)
        gap_len = end_index - start_index

        overlap_without_extend = gap_len + 2 * threshold <= k
        search_radius = k - (threshold if overlap_without_extend else 0)
        kmer = left_extend_over_gap(
            ivals, ref_seq, query_sbwt, threshold, threshold,
            start_index, end_index, search_radius,
        )

        kmer_found = len(kmer) > 0 and b"$" not in kmer
        no_indels = len(kmer) == threshold + gap_len + threshold

        matching_bases = [
            kmer_nt == ref_nt
            for kmer_nt, ref_nt in zip(
                kmer[min(threshold, len(kmer)) : min(threshold + gap_len, len(kmer))],
                ref_seq[start_index:end_index],
            )
        ]
        total_overlaps = sum(matching_bases)
        # sum of per-run cdfs over consecutive-match runs; a trailing run
        # that reaches the end of the window contributes nothing
        log_probs = 0.0
        consecutive = 0
        for x0, x1 in zip(matching_bases, matching_bases[1:]):
            if x0 and x1:
                consecutive += 1
            else:
                if consecutive > 0:
                    log_probs += log_rm_max_cdf(consecutive + 1, 4, 1)
                consecutive = 0

        fill_overlaps = log_probs > bound
        fill_flanked = (
            bool(matching_bases)
            and not matching_bases[0]
            and not matching_bases[-1]
            and total_overlaps + 2 == gap_len
        )
        get_stats().add("gaps_seen")
        if kmer_found and no_indels and (overlap_without_extend or fill_overlaps or fill_flanked):
            get_stats().add("gaps_filled")
            for t in range(start_index, end_index):
                kmer_nt = kmer[threshold + (t - start_index)]
                refined[t] = "M" if kmer_nt == ref_seq[t] else chr(kmer_nt)
    return refined
