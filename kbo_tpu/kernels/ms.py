"""Batched matching statistics on device (JAX/XLA).

TPU-native reformulation of the reference's sequential streaming MS walk
(reference: sbwt crate ``StreamingIndex::matching_statistics``, consumed at
src/index.rs:243-256): because MS is k-bounded, MS[i] depends only on the
k-character window ending at i, so every position is computed independently by
binary-searching the longest matching suffix length with fresh SBWT interval
extensions. Monotonicity (a suffix of a row-suffix is a row-suffix) makes the
search valid. No sequential scan, no LCS contraction; throughput is set by
gather bandwidth, and scales with the position batch, which is what TPUs want
(SURVEY §7.3 "MS walk sequentiality").

Cost per position: (1 + ceil(log2(k+1))) probes x k masked LF steps, each LF
step = 2 gathers of (bits, cum) rows from the rank table.

The rank table layout is one int32[...,2] row per 32-row block per base so a
single row gather answers one rank query (see SbwtIndex.device_arrays).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from kbo_tpu.index.sbwt import SbwtIndex


def _rank(table2: jax.Array, n_words: int, base: jax.Array, pos: jax.Array) -> jax.Array:
    """rank_base(pos) for per-lane base (0..3) and position arrays."""
    w = pos >> 5
    b = (pos & 31).astype(jnp.uint32)
    ent = jnp.take(table2, base * n_words + w, axis=0)  # [P, 2]
    word = ent[..., 0].astype(jnp.uint32)
    cum = ent[..., 1]
    mask = (jnp.uint32(1) << b) - jnp.uint32(1)
    return cum + jax.lax.population_count(word & mask).astype(jnp.int32)


def _extend(table2, C, n_words, l, r, c):
    """LF step: interval [l, r) of P -> interval of P + c. Invalid c -> empty."""
    valid = (c >= 1) & (c <= 4)
    base = jnp.clip(c - 1, 0, 3)
    c0 = jnp.take(C, base)
    nl = c0 + _rank(table2, n_words, base, l)
    nr = c0 + _rank(table2, n_words, base, r)
    nl = jnp.where(valid, nl, 0)
    nr = jnp.where(valid, nr, 0)
    return nl, nr


def _probe(table2, C, n_words, n_rows, windows, length, k):
    """Interval of the suffix of length `length` (per-lane) of each window.

    windows: int32 [P, k] (window chars, oldest first); length: int32 [P].
    Returns (l, r) with l < r iff the suffix occurs in the index.
    """
    P = windows.shape[0]
    l0 = jnp.zeros(P, dtype=jnp.int32)
    r0 = jnp.full(P, n_rows, dtype=jnp.int32)

    def body(t, lr):
        l, r = lr
        active = t >= (k - length)
        c = jax.lax.dynamic_index_in_dim(windows, t, axis=1, keepdims=False)
        nl, nr = _extend(table2, C, n_words, l, r, c)
        return (jnp.where(active, nl, l), jnp.where(active, nr, r))

    return jax.lax.fori_loop(0, k, body, (l0, r0))


@functools.partial(jax.jit, static_argnames=("k",))
def ms_kernel(table2, C, n_rows, windows, lmax, k: int):
    """MS values + colex intervals for a batch of k-windows.

    windows: int32 [P, k]; lmax: int32 [P] = min(k, position+1), the longest
    admissible suffix per lane. Returns (ms [P], l [P], r [P]) int32; lanes
    with ms == 0 carry the empty-string interval [0, n_rows).
    """
    n_words = table2.shape[0] // 4
    P = windows.shape[0]

    best_l = jnp.zeros(P, dtype=jnp.int32)
    best_r = jnp.full(P, n_rows, dtype=jnp.int32)

    # probe 0: the full admissible length (the common case on high-identity
    # data is a full k-length match, so most lanes finish here)
    l, r = _probe(table2, C, n_words, n_rows, windows, lmax, k)
    hit = l < r
    lo = jnp.where(hit, lmax, jnp.zeros_like(lmax))
    hi = jnp.where(hit, lmax, lmax - 1)
    best_l = jnp.where(hit, l, best_l)
    best_r = jnp.where(hit, r, best_r)

    # binary search over the remaining range [lo, hi]
    n_probes = max(1, math.ceil(math.log2(k + 1)))
    for _ in range(n_probes):
        mid = (lo + hi + 1) >> 1
        need = lo < hi
        l, r = _probe(table2, C, n_words, n_rows, windows, jnp.where(need, mid, 0), k)
        hit = need & (l < r)
        best_l = jnp.where(hit, l, best_l)
        best_r = jnp.where(hit, r, best_r)
        lo = jnp.where(hit, mid, lo)
        hi = jnp.where(need & ~hit, mid - 1, hi)

    return lo, best_l, best_r


class DeviceIndex:
    """An SbwtIndex's rank tables resident on a device."""

    def __init__(self, index: SbwtIndex, device=None):
        arrs = index.device_arrays()
        table = np.ascontiguousarray(
            arrs["table"].reshape(-1, 2)
        )  # [4*n_words, 2] int32
        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
        self.table2 = put(table)
        self.C = put(arrs["C"])
        self.n_rows = int(index.n_rows)
        self.k = int(index.k)


def windows_from_codes(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Build the [L, k] window matrix and per-position max suffix lengths.

    Window row i holds query[i-k+1 ..= i] with out-of-range positions filled
    with the invalid sentinel (they can never match, mirroring $-padding).
    """
    L = codes.size
    padded = np.concatenate(
        [np.full(k - 1, 255, dtype=np.uint8), codes.astype(np.uint8)]
    )
    win = np.lib.stride_tricks.sliding_window_view(padded, k)  # [L, k]
    lmax = np.minimum(k, np.arange(1, L + 1)).astype(np.int32)
    return win.astype(np.int32), lmax


def query_ms_device(
    index: SbwtIndex | DeviceIndex,
    codes: np.ndarray,
    block: int = 1 << 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Device-computed MS for one encoded query.

    Drop-in replacement for :func:`kbo_tpu.ops.ms.query_ms_codes`:
    returns (ms [L] int64, intervals [L, 2] int64).
    """
    dev = index if isinstance(index, DeviceIndex) else DeviceIndex(index)
    k = dev.k
    L = int(codes.size)
    win, lmax = windows_from_codes(np.asarray(codes), k)

    ms_out = np.empty(L, dtype=np.int64)
    iv_out = np.empty((L, 2), dtype=np.int64)
    # pad the final block to the fixed block shape to avoid recompiles
    for start in range(0, L, block):
        stop = min(L, start + block)
        n = stop - start
        wblk = win[start:stop]
        lblk = lmax[start:stop]
        if n < block and L > block:
            wblk = np.pad(wblk, ((0, block - n), (0, 0)))
            lblk = np.pad(lblk, (0, block - n))
        ms, l, r = ms_kernel(dev.table2, dev.C, dev.n_rows, wblk, lblk, k)
        ms_out[start:stop] = np.asarray(ms[:n], dtype=np.int64)
        iv_out[start:stop, 0] = np.asarray(l[:n], dtype=np.int64)
        iv_out[start:stop, 1] = np.asarray(r[:n], dtype=np.int64)
    return ms_out, iv_out
