"""Variant calling between a query and a reference.

Mirrors the reference module (reference: src/variant_calling.rs):

- :class:`Variant`                      (src/variant_calling.rs:8-19)
- :func:`resolve_variant`               (src/variant_calling.rs:139-201)
- :func:`call_variants`                 (src/variant_calling.rs:249-294)

The per-candidate k-mer MS re-runs use the same position-parallel MS engine
as the main pipeline; candidates are rare (one per variant site), so the host
orchestration here is off the hot path (SURVEY §7.3).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from kbo_tpu.index.sbwt import SbwtIndex
from kbo_tpu.ops.derandomize import random_match_threshold
from kbo_tpu.ops.ms import query_ms_codes
from kbo_tpu.index.encode import encode_ascii


@dataclasses.dataclass
class Variant:
    """A difference between query and reference at ``query_pos``.

    Empty ``query_chars`` = deletion; empty ``ref_chars`` = insertion
    (reference: src/variant_calling.rs:8-19).
    """

    query_pos: int
    query_chars: bytes
    ref_chars: bytes


class ResolveVariantErr(Exception):
    """Raised when a variant cannot be resolved (codes mirror the reference)."""

    def __init__(self, code: int, message: str = ""):
        self.code = code
        super().__init__(f"{message}: Could not resolve variant." if code == 1 else "Could not resolve variant.")


def get_kmer_ending_at(query: bytes, end_pos: int, k: int) -> bytes:
    """k-mer of `query` ending at `end_pos`, $-padded on the left if short
    (reference: src/variant_calling.rs:46-58)."""
    if end_pos >= k - 1:
        return bytes(query[end_pos + 1 - k : end_pos + 1])
    n_dollars = k - 1 - end_pos
    return b"$" * n_dollars + bytes(query[: end_pos + 1])


def longest_common_suffix(x: bytes, y: bytes) -> int:
    n = 0
    for i in range(min(len(x), len(y))):
        if x[len(x) - 1 - i] == y[len(y) - 1 - i]:
            n += 1
        else:
            break
    return n


def get_rightmost_significant_peak(ms: np.ndarray, threshold: int):
    """Rightmost i with ms[i] >= threshold and ms[i] > ms[i+1], or None
    (reference: src/variant_calling.rs:73-83)."""
    for i in range(len(ms) - 2, -1, -1):
        if ms[i] >= threshold and ms[i] > ms[i + 1]:
            return i
    return None


def resolve_variant(
    query_kmer: bytes,
    ref_kmer: bytes,
    ms_vs_query: np.ndarray,
    ms_vs_ref: np.ndarray,
    significant_match_threshold: int,
) -> tuple[bytes, bytes]:
    """Resolve the variant between two k-mers just before their common suffix.

    ``ms_vs_query`` is the MS of ``ref_kmer`` against the query index;
    ``ms_vs_ref`` the MS of ``query_kmer`` against the reference index
    (reference: src/variant_calling.rs:139-201). Raises ResolveVariantErr.
    """
    k = len(query_kmer)
    assert len(ref_kmer) == k
    assert len(ms_vs_query) == k
    assert len(ms_vs_ref) == k

    common_suffix_len = longest_common_suffix(query_kmer, ref_kmer)
    assert common_suffix_len > 0

    query_ms_peak = get_rightmost_significant_peak(ms_vs_ref, significant_match_threshold)
    ref_ms_peak = get_rightmost_significant_peak(ms_vs_query, significant_match_threshold)

    if query_ms_peak is not None and ref_ms_peak is not None:
        suffix_match_start = k - common_suffix_len
        # negative gap means overlap
        query_gap = suffix_match_start - query_ms_peak - 1
        ref_gap = suffix_match_start - ref_ms_peak - 1
        if query_gap > 0 and ref_gap > 0:
            return (
                bytes(query_kmer[query_ms_peak + 1 : suffix_match_start]),
                bytes(ref_kmer[ref_ms_peak + 1 : suffix_match_start]),
            )
        query_overlap = -query_gap
        ref_overlap = -ref_gap
        if query_overlap == ref_overlap:
            raise ResolveVariantErr(1, "query_overlap == ref_overlap")
        variant_len = abs(query_overlap - ref_overlap)
        if query_overlap > ref_overlap:
            # deletion in query
            return (b"", bytes(ref_kmer[ref_ms_peak + 1 : ref_ms_peak + 1 + variant_len]))
        # insertion in query
        return (bytes(query_kmer[query_ms_peak + 1 : query_ms_peak + 1 + variant_len]), b"")

    raise ResolveVariantErr(0)


def call_variants(
    sbwt_ref: SbwtIndex,
    sbwt_query: SbwtIndex,
    query: bytes,
    max_error_prob: float,
) -> list[Variant]:
    """Call all variants between `query` and the reference index.

    Exact mirror of the reference control flow (src/variant_calling.rs:249-294):
    detect MS drops below threshold, anchor at the next rightward unique match,
    re-run per-k-mer MS in both directions, and resolve.
    """
    assert sbwt_ref.k == sbwt_query.k
    k = sbwt_ref.k
    d = random_match_threshold(k, sbwt_ref.n_kmers, 4, max_error_prob)

    query = bytes(query)
    ms, ivals = query_ms_codes(sbwt_ref, encode_ascii(query))
    calls: list[Variant] = []
    n = len(query)
    for i in range(1, n):
        if ms[i] < ms[i - 1] and ms[i - 1] >= d and ms[i] < d:
            # go to the closest unique match position to the right
            for j in range(i + 1, min(i + k + 1, n)):
                if ms[j] >= d and ivals[j, 1] - ivals[j, 0] == 1:
                    ref_colex = int(ivals[j, 0])
                    query_kmer = get_kmer_ending_at(query, j, k)
                    ref_kmer = sbwt_ref.access_kmer(ref_colex)
                    kms_vs_ref, _ = query_ms_codes(sbwt_ref, encode_ascii(query_kmer))
                    kms_vs_query, _ = query_ms_codes(sbwt_query, encode_ascii(ref_kmer))
                    try:
                        qc, rc = resolve_variant(query_kmer, ref_kmer, kms_vs_query, kms_vs_ref, d)
                        calls.append(Variant(query_pos=i, query_chars=qc, ref_chars=rc))
                    except ResolveVariantErr:
                        pass
                    break
    return calls
