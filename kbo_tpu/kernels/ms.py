"""Batched matching statistics on device (JAX/XLA).

TPU-native reformulation of the reference's sequential streaming MS walk
(reference: sbwt crate ``StreamingIndex::matching_statistics``, consumed at
src/index.rs:243-256): because MS is k-bounded, MS[i] depends only on the
k-character window ending at i, so every position is computed independently by
binary-searching the longest matching suffix length with fresh SBWT interval
extensions. Monotonicity (a suffix of a row-suffix is a row-suffix) makes the
search valid. No sequential scan, no LCS contraction; throughput is set by
gather bandwidth and scales with the position batch, which is what TPUs want
(SURVEY §7.3 "MS walk sequentiality").

Cost per position: (1 + ceil(log2(k+1))) probes x k masked LF steps, each LF
step = 2 rank queries. The rank table packs (bitvector word, popcount prefix)
as one int32[...,2] row per 32-row block per base, so one row gather answers
one rank query (see SbwtIndex.device_arrays).

Query layout: each query is stored in a flat uint8 code buffer with k-1
leading INVALID sentinels; the window ending at query position i spans
buffer[base+i .. base+i+k-1]. Characters are gathered per LF step; no window
matrix is materialized. Multiple queries concatenate into one buffer, which
is also the unit the distributed layer shards.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from kbo_tpu.index.sbwt import SbwtIndex

INVALID = 255


def _rank(table2: jax.Array, n_words, base: jax.Array, pos: jax.Array) -> jax.Array:
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
    base = jnp.clip(c - 1, 0, 3).astype(jnp.int32)
    c0 = jnp.take(C, base)
    nl = c0 + _rank(table2, n_words, base, l)
    nr = c0 + _rank(table2, n_words, base, r)
    nl = jnp.where(valid, nl, 0)
    nr = jnp.where(valid, nr, 0)
    return nl, nr


def _probe(table2, C, n_words, n_rows, buf, pos, length, k: int):
    """Interval of the window suffix of per-lane `length` ending at each pos.

    buf: uint8 code buffer; pos: int32 [P] window-start indices into buf
    (window chars are buf[pos+t], t in [0, k)); length: int32 [P].
    """
    # derive the init from varying inputs (buf) so the loop carry is marked
    # axis-varying under shard_map's per-shard type checking
    zero = (jnp.take(buf, 0) * 0).astype(jnp.int32)
    l0 = jnp.zeros_like(pos) + zero
    r0 = l0 + jnp.int32(n_rows)

    def body(t, lr):
        l, r = lr
        active = t >= (k - length)
        c = jnp.take(buf, pos + t).astype(jnp.int32)
        nl, nr = _extend(table2, C, n_words, l, r, c)
        return (jnp.where(active, nl, l), jnp.where(active, nr, r))

    return jax.lax.fori_loop(0, k, body, (l0, r0))


def ms_core(table2, C, n_rows, buf, pos, lmax, k: int):
    """MS values + colex intervals for a batch of window positions.

    Returns (ms, l, r) int32 [P]; ms == 0 lanes carry [0, n_rows).
    This is the un-jitted core, reusable inside fused pipelines.
    """
    n_words = table2.shape[0] // 4
    P = pos.shape[0]
    best_l = jnp.zeros(P, dtype=jnp.int32)
    best_r = jnp.full(P, n_rows, dtype=jnp.int32)

    # probe 0: full admissible length (most lanes finish here on
    # high-identity data)
    l, r = _probe(table2, C, n_words, n_rows, buf, pos, lmax, k)
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
        l, r = _probe(
            table2, C, n_words, n_rows, buf, pos, jnp.where(need, mid, 0), k
        )
        hit = need & (l < r)
        best_l = jnp.where(hit, l, best_l)
        best_r = jnp.where(hit, r, best_r)
        lo = jnp.where(hit, mid, lo)
        hi = jnp.where(need & ~hit, mid - 1, hi)

    return lo, best_l, best_r


ms_kernel = jax.jit(ms_core, static_argnames=("k",))


def ms_long_core(table2, C, n_rows, buf, true_len, k: int, block: int):
    """MS over all positions of ONE long query in a single dispatch.

    buf: uint8 [k-1 + Lp] with Lp a multiple of `block`; position blocks run
    under lax.map (sequential on device) to bound working memory. One device
    dispatch regardless of length -- per-dispatch latency is significant on
    remote-attached accelerators.
    """
    Lp = buf.shape[0] - (k - 1)
    nb = Lp // block

    def do_block(i):
        pos = i * block + jnp.arange(block, dtype=jnp.int32)
        lmax = jnp.minimum(jnp.int32(k), pos + 1)
        lmax = jnp.where(pos < true_len, lmax, 0)
        return ms_core(table2, C, n_rows, buf, pos, lmax, k)

    ms, l, r = jax.lax.map(do_block, jnp.arange(nb, dtype=jnp.int32))
    return ms.reshape(-1), l.reshape(-1), r.reshape(-1)


ms_long_kernel = jax.jit(ms_long_core, static_argnames=("k", "block"))


def pad_long(codes: np.ndarray, k: int, block: int = 1 << 16):
    """Sentinel-pad one query for the long-path kernels; returns (buf, L)."""
    L = int(codes.size)
    b = block
    while b > L and b > 1024:
        b >>= 1
    nb = (L + b - 1) // b
    # bucket the block count to powers of two to bound compile variants
    nb2 = 1
    while nb2 < nb:
        nb2 <<= 1
    Lp = nb2 * b
    buf = np.full(k - 1 + Lp, INVALID, dtype=np.uint8)
    buf[k - 1 : k - 1 + L] = np.asarray(codes, dtype=np.uint8)
    return buf, L, b


class DeviceIndex:
    """An SbwtIndex's rank tables resident on a device."""

    def __init__(self, index: SbwtIndex, device=None):
        arrs = index.device_arrays()
        table = np.ascontiguousarray(arrs["table"].reshape(-1, 2))
        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
        self.table2 = put(table)
        self.C = put(arrs["C"])
        self.n_rows = int(index.n_rows)
        self.k = int(index.k)


def pack_queries(code_list: list[np.ndarray], k: int):
    """Concatenate queries into one padded buffer.

    Returns (buf uint8 [T], pos int32 [P], lmax int32 [P], offsets) where P =
    total query length and offsets[i] slices query i's results.
    """
    bufs, poss, lmaxs, offsets = [], [], [], [0]
    base = 0
    pad = np.full(k - 1, INVALID, dtype=np.uint8)
    for c in code_list:
        c = np.asarray(c, dtype=np.uint8)
        bufs.append(pad)
        bufs.append(c)
        poss.append(base + np.arange(c.size, dtype=np.int32))
        lmaxs.append(np.minimum(k, np.arange(1, c.size + 1)).astype(np.int32))
        base += c.size + k - 1
        offsets.append(offsets[-1] + c.size)
    return (
        np.concatenate(bufs),
        np.concatenate(poss),
        np.concatenate(lmaxs),
        offsets,
    )


def _bucket(n: int, blocks=(1024, 4096, 16384, 65536)) -> int:
    for b in blocks:
        if n <= b:
            return b
    return blocks[-1]


def ms_packed(
    dev: DeviceIndex,
    buf: np.ndarray,
    pos: np.ndarray,
    lmax: np.ndarray,
    block: int | None = None,
):
    """Run the MS kernel over a packed query buffer, chunking positions.

    Pads the buffer and each position chunk to bucketed sizes so the number
    of compiled kernel variants stays small.
    """
    k = dev.k
    P = pos.size
    block = block or min(_bucket(P), 65536)
    # bucket-pad the shared buffer (tail sentinels are never dereferenced by
    # in-range positions beyond pos+k-1)
    T = _bucket(buf.size + k, tuple(1 << s for s in range(10, 27)))
    bufp = np.full(T, INVALID, dtype=np.uint8)
    bufp[: buf.size] = buf
    bufj = jnp.asarray(bufp)

    ms = np.empty(P, dtype=np.int64)
    iv = np.empty((P, 2), dtype=np.int64)
    for s in range(0, P, block):
        e = min(P, s + block)
        p = pos[s:e]
        lm = lmax[s:e]
        if e - s < block:
            p = np.pad(p, (0, block - (e - s)))
            lm = np.pad(lm, (0, block - (e - s)))
        m, l, r = ms_kernel(dev.table2, dev.C, dev.n_rows, bufj, p, lm, k)
        ms[s:e] = np.asarray(m[: e - s], dtype=np.int64)
        iv[s:e, 0] = np.asarray(l[: e - s], dtype=np.int64)
        iv[s:e, 1] = np.asarray(r[: e - s], dtype=np.int64)
    return ms, iv


def query_ms_device(
    index: SbwtIndex | DeviceIndex, codes: np.ndarray, block: int | None = None
):
    """Device-computed MS for one encoded query.

    Drop-in replacement for :func:`kbo_tpu.ops.ms.query_ms_codes`. Large
    queries take the single-dispatch long path.
    """
    dev = index if isinstance(index, DeviceIndex) else DeviceIndex(index)
    codes = np.asarray(codes)
    if codes.size > (1 << 16):
        buf, L, b = pad_long(codes, dev.k)
        ms, l, r = ms_long_kernel(
            dev.table2, dev.C, dev.n_rows, jnp.asarray(buf), jnp.int32(L),
            dev.k, b,
        )
        ms_np = np.asarray(ms[:L], dtype=np.int64)
        iv = np.stack(
            [np.asarray(l[:L], dtype=np.int64), np.asarray(r[:L], dtype=np.int64)],
            axis=1,
        )
        return ms_np, iv
    buf, pos, lmax, _ = pack_queries([codes], dev.k)
    return ms_packed(dev, buf, pos, lmax, block=block)
