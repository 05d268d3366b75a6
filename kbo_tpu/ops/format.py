"""Alignment formatting: run-length encodings and reference-relative output.

Mirrors the reference module (reference: src/format.rs):

- :class:`RLE`                (src/format.rs:18-33)
- :func:`run_lengths`         (src/format.rs:98-102)
- :func:`run_lengths_gapped`  (src/format.rs:143-193)
- :func:`relative_to_ref`     (src/format.rs:266-287)

Note the reference RLE doc comment claims 1-based positions but the code emits
0-based start with half-open end (src/format.rs:93-94); the CLI layer adds +1.
We mirror the struct exactly (0-based) -- parity hazard flagged in SURVEY §2.1.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class RLE:
    """Run length encoding for an alignment segment (0-based, half-open)."""

    start: int = 0
    end: int = 0
    matches: int = 0
    mismatches: int = 0
    jumps: int = 0
    gap_bases: int = 0
    gap_opens: int = 0


def _as_chars(aln) -> list[str]:
    if isinstance(aln, np.ndarray):
        if aln.dtype == np.uint8:
            return [chr(c) for c in aln]
        return [str(c) for c in aln]
    if isinstance(aln, (bytes, bytearray)):
        return [chr(c) for c in aln]
    return list(aln)


def run_lengths(aln) -> list[RLE]:
    """RLE segments with no gap tolerance (reference: src/format.rs:98-102)."""
    return run_lengths_gapped(aln, 0)


def run_lengths_gapped(aln, max_gap_len: int) -> list[RLE]:
    """RLE segments allowing gap runs up to ``max_gap_len`` bases.

    Exact transliteration of the reference loop, including the trailing-gap
    back-out behavior (reference: src/format.rs:143-193).
    """
    chars = _as_chars(aln)
    n = len(chars)
    encodings: list[RLE] = []
    i = 0
    match_start = False
    while i < n:
        match_start = (chars[i] != "-" and chars[i] != " ") and not match_start
        if match_start:
            rle = RLE(start=i)
            within_gap_bases = 0
            within_gap_start = False
            while i < n and chars[i] != " ":
                c = chars[i]
                is_true_gap = c == "-"
                if is_true_gap and not within_gap_start:
                    within_gap_start = True
                    rle.gap_opens += 1
                    within_gap_bases = 0
                if not is_true_gap and within_gap_start:
                    within_gap_start = False
                is_match = c in ("M", "R", "I")
                is_gap = is_true_gap or c == "D"
                rle.matches += is_match
                rle.gap_bases += is_gap
                rle.mismatches += (not is_match) and (not is_gap)
                if is_match or not is_gap:
                    rle.end = i + 1
                rle.jumps += c == "R" and i > 0 and chars[i - 1] == "R"
                within_gap_bases += c == "-"
                i += 1
                if within_gap_bases > max_gap_len or (
                    is_gap and i == n and rle.gap_opens > 0
                ):
                    rle.gap_opens -= 1
                    rle.gap_bases -= within_gap_bases
                    break
            encodings.append(rle)
            match_start = False
        else:
            i += 1
    return encodings


def relative_to_ref(ref_seq: bytes, alignment) -> bytes:
    """Nucleotide sequence of the alignment relative to the reference.

    Vectorized map (reference: src/format.rs:266-287): M/R/I -> ref char,
    X/D/- -> '-', anything else (nucleotides from refinement) passes through.
    """
    ref = np.frombuffer(bytes(ref_seq), dtype=np.uint8)
    if isinstance(alignment, np.ndarray) and alignment.dtype == np.uint8:
        aln = alignment
    else:
        aln = np.frombuffer(
            "".join(_as_chars(alignment)).encode("latin-1"), dtype=np.uint8
        )
    m = min(ref.size, aln.size)
    ref, aln = ref[:m], aln[:m]
    out = aln.copy()
    take_ref = (aln == ord("M")) | (aln == ord("R")) | (aln == ord("I"))
    dash = (aln == ord("X")) | (aln == ord("D")) | (aln == ord("-"))
    out[take_ref] = ref[take_ref]
    out[dash] = ord("-")
    return out.tobytes()
