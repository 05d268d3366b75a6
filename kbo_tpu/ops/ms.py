"""k-bounded matching statistics (host reference implementation).

MS[i] = length (capped at k) of the longest suffix of query[..=i] that occurs
in the index (i.e. is the suffix of some SBWT row), together with its colex
interval. Mirrors ``query_sbwt`` / ``StreamingIndex::matching_statistics``
(reference: src/index.rs:243-256; golden vector src/index.rs:224-241).

TPU-native design note: instead of the reference's sequential streaming
extend/contract walk (amortized O(1) per base but latency-bound on
accelerators), we exploit that MS[i] depends only on the k-window ending at i
and binary-search the longest matching suffix length per position with fresh
interval searches. This is embarrassingly parallel across positions; the
batched device implementation lives in ``kbo_tpu.kernels.ms``. This module is
the scalar oracle used for tests and small inputs.
"""

from __future__ import annotations

import numpy as np

from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.index.sbwt import SbwtIndex


def _suffix_interval(index: SbwtIndex, codes: np.ndarray, end: int, length: int):
    """Interval of codes[end-length+1 ..= end] as a row suffix, or None."""
    l, r = 0, index.n_rows
    for j in range(end - length + 1, end + 1):
        l, r = index.extend(l, r, int(codes[j]))
        if l >= r:
            return None
    return (l, r)


def query_ms_codes(index: SbwtIndex, codes: np.ndarray):
    """MS values + colex intervals for an encoded query.

    Returns (ms [n] int64, intervals [n, 2] int64). For MS value 0 the
    interval is the full row range [0, n_rows) (the empty-string interval).
    """
    n = codes.size
    k = index.k
    ms = np.zeros(n, dtype=np.int64)
    ivals = np.zeros((n, 2), dtype=np.int64)
    ivals[:, 1] = index.n_rows
    for i in range(n):
        lo, hi = 0, min(k, i + 1)
        best = (0, index.n_rows)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            res = _suffix_interval(index, codes, i, mid)
            if res is not None:
                lo = mid
                best = res
            else:
                hi = mid - 1
        ms[i] = lo
        if lo > 0:
            ivals[i] = best
    return ms, ivals


def query_ms(index: SbwtIndex, query: bytes):
    """MS values + intervals for an ASCII query (mirrors query_sbwt)."""
    return query_ms_codes(index, encode_ascii(query))
