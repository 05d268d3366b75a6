"""SBWT construction (host, vectorized numpy).

Construction is a preprocessing step in the reference as well (it forwards to
the sbwt crate's bit-packed k-mer sorting, reference: src/index.rs:56-99); we
build with vectorized numpy: windows -> colex lexsort -> dedup -> subset
matrix + rank tables + LCS. A device (jax.lax.sort) construction path can be
added behind the same interface for the `call()` hot path.

Row-set semantics (pinned by the golden MS vector, reference:
src/index.rs:224-241): rows are the distinct length-k windows of
``$^k + segment`` over every maximal ACGT run of every input sequence.
"""

from __future__ import annotations

import numpy as np

from kbo_tpu.index.encode import encode_ascii, revcomp_ascii, split_segments
from kbo_tpu.index.sbwt import N_BASES, SbwtIndex
from kbo_tpu.opts import BuildOpts

try:  # numpy >= 2.0
    _popcount32 = np.bitwise_count
except AttributeError:  # pragma: no cover - fallback for old numpy
    _LUT16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)

    def _popcount32(words):
        w = words.astype(np.uint32)
        return _LUT16[w & 0xFFFF].astype(np.int32) + _LUT16[w >> 16]


def _window_matrix(segments: list[np.ndarray], k: int) -> np.ndarray:
    """All length-k windows of $^k + segment, stacked. uint8 [n, k]."""
    parts = []
    for seg in segments:
        padded = np.concatenate([np.zeros(k, dtype=np.uint8), seg])
        win = np.lib.stride_tricks.sliding_window_view(padded, k)
        parts.append(win[: seg.size + 1])
    return np.ascontiguousarray(np.concatenate(parts, axis=0))


def _sort_block(rows: np.ndarray) -> np.ndarray:
    """Colex sort one block of rows (primary key = last column), dedup."""
    k = rows.shape[1]
    order = np.lexsort(tuple(rows[:, j] for j in range(k)))
    rows = rows[order]
    if rows.shape[0] > 1:
        keep = np.empty(rows.shape[0], dtype=bool)
        keep[0] = True
        np.any(rows[1:] != rows[:-1], axis=1, out=keep[1:])
        rows = rows[keep]
    return rows


def _colex_sort_dedup(rows: np.ndarray, num_threads: int = 1) -> np.ndarray:
    """Colex sort rows and drop duplicates.

    With num_threads > 1, rows partition by their last character (the
    primary colex key) and the buckets sort concurrently -- numpy's sorts
    release the GIL, so plain threads scale. Duplicates share every
    character, so per-bucket dedup is global dedup; concatenating buckets
    in character order restores full colex order. This is the new
    framework's take on the reference's construction-thread knob
    (reference: src/index.rs:75,88).
    """
    if num_threads > 1 and rows.shape[0] > (1 << 16):
        from concurrent.futures import ThreadPoolExecutor

        last = rows[:, -1]
        with ThreadPoolExecutor(max_workers=num_threads) as ex:
            parts = list(
                ex.map(lambda c: _sort_block(rows[last == c]), range(5))
            )
        return np.concatenate([p for p in parts if p.shape[0]], axis=0)
    return _sort_block(rows)


def _lcs_array(rows: np.ndarray) -> np.ndarray:
    """lcs[i] = longest common suffix length of rows i-1 and i."""
    n, k = rows.shape
    lcs = np.zeros(n, dtype=np.uint8)
    if n > 1:
        eq_rev = rows[1:, ::-1] == rows[:-1, ::-1]
        # rows are distinct, so argmin (first False) is well defined
        lcs[1:] = np.argmin(eq_rev, axis=1)
    return lcs


def _rank_strings(strings: np.ndarray) -> np.ndarray:
    """Dense colex ranks of (k-1)-length code strings."""
    m, w = strings.shape
    if w == 0:
        return np.zeros(m, dtype=np.int64)
    order = np.lexsort(tuple(strings[:, j] for j in range(w)))
    s = strings[order]
    new_group = np.ones(m, dtype=np.int64)
    if m > 1:
        new_group[1:] = np.any(s[1:] != s[:-1], axis=1)
    ranks_sorted = np.cumsum(new_group) - 1
    ranks = np.empty(m, dtype=np.int64)
    ranks[order] = ranks_sorted
    return ranks


def pack_rows_2bit(rows: np.ndarray) -> np.ndarray:
    """Colex-packed 2-bit keys: uint32 [W2, n], 16 chars per word.

    Chunk t (t-th char from the END of the row) occupies bits
    [30 - 2*(t%16), 31 - 2*(t%16)] of word t//16, so integer order of the
    word tuple == colex order of the rows (for pure-ACGT rows). Char codes
    1..4 map to 0..3; '$' (0) maps to an arbitrary chunk -- callers must cap
    match lengths with per-row validity when dummies are packed this way.
    """
    n, k = rows.shape
    W = (k + 15) // 16
    keys = np.zeros((W, n), dtype=np.uint32)
    chunks = ((rows[:, ::-1].astype(np.uint32) - 1) & 3)  # chunk t = col t
    for t in range(k):
        keys[t // 16] |= chunks[:, t] << (30 - 2 * (t % 16))
    return keys


def pack_rows_3bit(rows: np.ndarray) -> np.ndarray:
    """Colex-packed 3-bit keys: uint32 [W3, n], 10 chars per word.

    Chunk values are the raw codes (0='$' < 1..4=ACGT), so integer order ==
    true colex order including dummy rows; chunk value 7 never occurs in an
    index key and serves as the query-side never-match sentinel. Chunk t sits
    at bits [27 - 3*(t%10) ..] of word t//10; the top 2 bits are zero.
    """
    n, k = rows.shape
    W = (k + 9) // 10
    keys = np.zeros((W, n), dtype=np.uint32)
    chunks = rows[:, ::-1].astype(np.uint32)
    for t in range(k):
        keys[t // 10] |= chunks[:, t] << (27 - 3 * (t % 10))
    return keys


def build_index_from_segments(
    segments: list[np.ndarray], k: int, num_threads: int = 1
) -> SbwtIndex:
    """Core construction from pre-encoded valid segments."""
    assert segments, "cannot build an index from empty input"
    assert 1 < k < 256, "k must be in (1, 256)"
    rows = _colex_sort_dedup(_window_matrix(segments, k), num_threads)
    n = rows.shape[0]
    lcs = _lcs_array(rows)
    real = rows[:, 0] != 0  # a '$' can only appear as a prefix
    n_kmers = int(np.count_nonzero(real))

    # packed sort-join keys (see kbo_tpu.kernels.ms): 2-bit keys over real
    # rows for the value-only hot path; 3-bit keys over all rows for the
    # interval path; dummy rows separately with their real-suffix lengths
    keys2 = pack_rows_2bit(rows[real])
    keys3 = pack_rows_3bit(rows)
    dummies = rows[~real]
    dummy2 = pack_rows_2bit(dummies)
    dummy_v = (k - np.count_nonzero(dummies == 0, axis=1)).astype(np.int32)

    # C array from last-character boundaries (last column is non-decreasing).
    last = rows[:, -1]
    C = np.searchsorted(last, np.arange(1, N_BASES + 1)).astype(np.int32)

    # Incoming edge of every non-root row y = (prefix y[:k-1], char y[k-1]):
    # set bit `char` on the colex-smallest row whose (k-1)-suffix equals the
    # prefix. Match via dense ranks over the union of suffixes and prefixes.
    union = np.concatenate([rows[:, 1:], rows[:, :-1]], axis=0)
    ranks = _rank_strings(union)
    r_suffix, r_prefix = ranks[:n], ranks[n:]
    # r_suffix is non-decreasing along colex row order.
    y = np.arange(1, n)  # row 0 is the all-$ root: no incoming edge
    pred = np.searchsorted(r_suffix, r_prefix[y])
    if not np.all(r_suffix[pred] == r_prefix[y]):
        raise AssertionError("every non-root row must have a predecessor")
    edge_char = last[y]  # 1..4

    # one guard word past the last row: rank queries at pos == n_rows (the
    # initial full interval's right end) index word n_rows >> 5, which falls
    # outside ceil(n/32) words exactly when n_rows % 32 == 0
    n_words = n // 32 + 1
    bits = np.zeros((N_BASES, n_words), dtype=np.uint32)
    for b in range(N_BASES):
        sel = pred[edge_char == b + 1]
        np.bitwise_or.at(
            bits[b], sel >> 5, (np.uint32(1) << (sel & 31).astype(np.uint32))
        )
    pc = _popcount32(bits).astype(np.int64)
    cum = np.zeros((N_BASES, n_words), dtype=np.int64)
    cum[:, 1:] = np.cumsum(pc, axis=1)[:, :-1]
    assert cum.max(initial=0) < 2**31
    return SbwtIndex(
        k=k,
        n_rows=n,
        n_kmers=n_kmers,
        bits=bits,
        cum=cum.astype(np.int32),
        C=C,
        lcs=lcs,
        keys2=keys2,
        keys3=keys3,
        dummy2=dummy2,
        dummy_v=dummy_v,
    )


def build_sbwt_from_seqs(seqs, opts: BuildOpts | None = None) -> SbwtIndex:
    """Build an SBWT index from ASCII sequences.

    Mirrors ``build_sbwt_from_vecs`` (reference: src/index.rs:56-99): all
    sequences are merged into one index; non-ACGT characters break sequences
    into independent segments; ``add_revcomp`` also indexes reverse
    complements.
    """
    opts = opts or BuildOpts()
    segments: list[np.ndarray] = []
    for seq in seqs:
        if isinstance(seq, str):
            seq = seq.encode()
        elif isinstance(seq, np.ndarray):
            seq = seq.tobytes()
        segments.extend(split_segments(encode_ascii(seq)))
        if opts.add_revcomp:
            segments.extend(split_segments(encode_ascii(revcomp_ascii(seq))))
    return build_index_from_segments(segments, opts.k, opts.num_threads)
