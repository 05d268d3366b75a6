"""Batched matching statistics on device via sorted k-mer join (JAX/XLA).

TPU-native reformulation of the reference's sequential streaming MS walk
(reference: sbwt crate ``StreamingIndex::matching_statistics``, consumed at
src/index.rs:243-256). Random-access rank queries -- the heart of the
FM/SBWT walk -- are pathological on TPU (XLA serializes gathers), so the
engine never gathers. Instead it exploits that the SBWT row set is exactly
the set of k-windows of the indexed text:

    MS[i] = the longest common *colex prefix* between the query window
            ending at i (packed as an integer key, last char most
            significant) and its nearest neighbors in the colex-sorted
            reference key array.

That turns MS into: pack window keys -> one big sort of [ref keys, query
keys] -> nearest-reference propagation (log-depth doubling scans) ->
XOR/count-leading-zeros for the common-prefix length -> sort back by
position. Sorts and elementwise ops only; this is what TPUs are fast at.

Two key spaces:

- **2-bit keys** (16 chars/word, real ACGT rows only): the value-only hot
  path (``find``/``matches``). Query windows are capped by ``limit[i]`` =
  length of the valid-char run ending at i (capped at k), which makes
  arbitrary chunk values at invalid/pre-start positions harmless: if the
  integer common prefix reaches ``limit`` the true match IS ``limit``; below
  it every compared chunk is a real char. Matches against the index's
  $-padded dummy rows are added by a separate small pass over the D dummy
  rows (D ~ k per input segment): exact per-dummy ``min(common, v_dummy)``.

- **3-bit keys** (10 chars/word, all rows, '$'=0 < A..T=1..4, query
  invalid/pad=7 never matches): true colex integer order including dummies.
  Used by the full-interval reference path (query_ms_device) and by the
  index-free vs-seq join (``call()``, pad chunk 5). Colex intervals for the
  refinement layers come from the sparse 2-bit windows path
  (ms2_windows_core): *floor* (pattern + 'A'-fill) and *ceil* (pattern +
  'T'-fill) probes counted against the real rows plus an exact dummy-row
  rank adjustment.

Multi-word keys sort by LSD radix: W stable single-key ``lax.sort`` passes
(one compiled sort reused per pass; a direct ``num_keys=W`` sort measured
minutes of XLA:TPU compile time vs seconds for sort1). On TPU the combine
against presorted reference keys is the Pallas bitonic merge and the
nearest-reference propagation is the Pallas streaming kernel
(kernels/pallas_sort.py, kernels/pallas_join.py).

Golden vector to verify: query vs 18-base ref gives MS
[1,2,2,3,2,2,3,2,1,2,3,1,1,1,2,3,1,2] (reference: src/index.rs:238-240).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kbo_tpu.index.sbwt import SbwtIndex

INVALID = 255
_BIG = np.int32(2**31 - 1)


def w2_for_k(k: int) -> int:
    return (k + 15) // 16


def w3_for_k(k: int) -> int:
    return (k + 9) // 10


# --------------------------------------------------------------- packing


def _shift_up_const(x, t: int, fill):
    """y[p] = x[p - t] with the first t entries filled (static t)."""
    if t == 0:
        return x
    return jnp.concatenate([jnp.full((t,), fill, dtype=x.dtype), x[:-t]])


def pack_windows_2bit(buf, k: int):
    """2-bit window keys for every position of a flat code buffer.

    buf: uint8 [T] codes (1..4 real; anything else is a barrier). Returns
    (words: list of W2 uint32 [T], limit: int32 [T]) where limit[p] =
    min(k, length of the valid run ending at p).
    """
    T = buf.shape[0]
    c = ((buf.astype(jnp.uint32) - 1) & 3)
    valid = (buf >= 1) & (buf <= 4)
    idx = jnp.arange(T, dtype=jnp.int32)
    last_bad = _doubling_cummax(jnp.where(valid, jnp.int32(-1), idx))
    limit = jnp.minimum(jnp.int32(k), idx - last_bad)
    words = []
    for w in range(w2_for_k(k)):
        acc = jnp.zeros(T, dtype=jnp.uint32)
        for j in range(16):
            t = w * 16 + j
            if t >= k:
                break
            acc = acc | (_shift_up_const(c, t, 0) << (30 - 2 * j))
        words.append(acc)
    return words, limit


def pack_windows_3bit(buf, k: int, pad_chunk: int = 7):
    """3-bit window keys ('$'/invalid/pre-start -> `pad_chunk`).

    Query sides pad with 7; an index side built directly from a sequence
    (no dedup) pads with 5, so its pads never match a query's real chars
    (1..4) NOR a query's own pads (7) -- the exact '$'-boundary semantics.
    """
    T = buf.shape[0]
    valid = (buf >= 1) & (buf <= 4)
    c = jnp.where(valid, buf.astype(jnp.uint32), jnp.uint32(pad_chunk))
    words = []
    for w in range(w3_for_k(k)):
        acc = jnp.zeros(T, dtype=jnp.uint32)
        for j in range(10):
            t = w * 10 + j
            if t >= k:
                break
            acc = acc | (_shift_up_const(c, t, pad_chunk) << (27 - 3 * j))
        words.append(acc)
    return words


# ------------------------------------------------------- scan primitives


def _doubling_cummax(x):
    """Inclusive left-to-right cummax, log-depth, compile-light."""
    L = x.shape[0]
    lowest = jnp.iinfo(x.dtype).min
    s = 1
    while s < L:
        shifted = jnp.concatenate([jnp.full((s,), lowest, x.dtype), x[:-s]])
        x = jnp.maximum(x, shifted)
        s <<= 1
    return x


def _propagate_nearest(vals, seen, reverse: bool):
    """Per slot, the `vals` of the nearest flagged slot at-or-before it
    (at-or-after if reverse). Returns (vals, found)."""
    N = seen.shape[0]
    s = 1
    while s < N:
        if reverse:
            sh = lambda a, f: jnp.concatenate(
                [a[s:], jnp.full((s,), f, a.dtype)]
            )
        else:
            sh = lambda a, f: jnp.concatenate(
                [jnp.full((s,), f, a.dtype), a[:-s]]
            )
        seen_sh = sh(seen, False)
        vals = [jnp.where(seen, v, sh(v, 0)) for v in vals]
        seen = seen | seen_sh
        s <<= 1
    return vals, seen


# ------------------------------------------------------------ sort-join


def _radix_sort(arrays, n_key_words: int):
    """Stable LSD radix sort of parallel arrays by their first n_key_words
    uint32 word arrays (most significant first).

    Measured alternatives (2M-base genome, one v5e chip), for the record:
    a fused num_keys=W lax.sort halves the passes but its XLA:TPU
    comparator compile time at multi-million-row shapes runs to many
    minutes; a jnp bitonic MERGE against the presorted reference keys
    (log-stage half-cleaner of reshape+select) compiled for minutes AND ran
    ~4x slower than these passes -- the per-stage interleave forces full
    relayouts. lax.sort1 runs at ~1.3 TB/s effective here, near HBM
    bandwidth; beating it would take a Pallas merge kernel, not XLA ops."""
    ops = list(arrays)
    for w in range(n_key_words - 1, -1, -1):
        rest = ops[:w] + ops[w + 1 :]
        out = jax.lax.sort(tuple([ops[w]] + rest), num_keys=1, is_stable=True)
        ops = list(out[1 : w + 1]) + [out[0]] + list(out[w + 1 :])
    return ops


def _common2(a, b):
    """Common 2-bit-chunk prefix length between word lists a and b."""
    total = jnp.zeros(a[0].shape, dtype=jnp.int32)
    alive = jnp.ones(a[0].shape, dtype=bool)
    for w in range(len(a)):
        x = a[w] ^ b[w]
        nz = x != 0
        cw = jnp.where(nz, jax.lax.clz(x) >> 1, 16).astype(jnp.int32)
        total = total + jnp.where(alive, cw, 0)
        alive = alive & ~nz
    return total


def _common3(a, b):
    """Common 3-bit-chunk prefix length between word lists a and b."""
    total = jnp.zeros(a[0].shape, dtype=jnp.int32)
    alive = jnp.ones(a[0].shape, dtype=bool)
    for w in range(len(a)):
        x = a[w] ^ b[w]
        nz = x != 0
        clz = jax.lax.clz(x).astype(jnp.int32)
        cw = jnp.where(nz, (clz - 2) // 3, 10)
        total = total + jnp.where(alive, cw, 0)
        alive = alive & ~nz
    return total


def _use_pallas_merge() -> bool:
    import os

    if os.environ.get("KBO_TPU_PALLAS", "1") == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - uninitialized backend
        return False


def _neighbor_common(ref_words, q_words, q_meta, common_fn, ref_sorted=True):
    """Max common-prefix length of each query key with any reference key.

    ref_words/q_words: lists of W uint32 arrays ([n] and [L]); q_meta:
    int32 [L] identifiers (< 2**31 - 1). Returns int32 [L] in q order.

    On TPU with a presorted reference, only the query side radix-sorts and
    the combine is the Pallas bitonic merge (kernels/pallas_sort.py, ~20x
    faster than re-sorting the concatenation); the rank component (ref 0 <
    query 1) pins equal reference keys before the probe, reproducing the
    stable-radix tie semantics.
    """
    W = len(ref_words)
    n = ref_words[0].shape[0]
    L = q_words[0].shape[0]
    if ref_sorted and _use_pallas_merge():
        from kbo_tpu.kernels.pallas_join import nearest_common
        from kbo_tpu.kernels.pallas_sort import bitonic_merge

        bits = 2 if common_fn is _common2 else 3
        q_ops = _radix_sort(list(q_words) + [q_meta], W)
        merged = bitonic_merge(
            list(ref_words)
            + [
                jnp.zeros(n, jnp.int32),
                jnp.full((n,), _BIG, jnp.int32),
            ],
            q_ops[:W] + [jnp.ones(L, jnp.int32), q_ops[W]],
            n_comps=W + 1,
            slice_output=False,  # pads are rank +inf: never references
        )
        total = n + L
        sw_p, srank_p = merged[:W], merged[W]
        c_fwd = nearest_common(sw_p, srank_p, bits, reverse=False)
        c_bwd = nearest_common(sw_p, srank_p, bits, reverse=True)
        c = jnp.maximum(c_fwd, c_bwd)[:total]
        smeta = merged[W + 1][:total]
        if n + L < (1 << 24) - 1:
            is_ref_s = srank_p[:total] == 0
            slot = jnp.where(
                is_ref_s, jnp.uint32(0xFFFFFF), smeta.astype(jnp.uint32)
            )
            packed = (slot << 8) | jnp.minimum(c, 255).astype(jnp.uint32)
            back = jax.lax.sort((packed,), num_keys=1, is_stable=False)
            return (back[0][:L] & 255).astype(jnp.int32)
        back = jax.lax.sort((smeta, c), num_keys=1, is_stable=False)
        return back[1][:L]
    else:
        words = [
            jnp.concatenate([ref_words[w], q_words[w]]) for w in range(W)
        ]
        meta = jnp.concatenate([jnp.full((n,), _BIG, jnp.int32), q_meta])
        ops = _radix_sort(words + [meta], W)
        sw, smeta = ops[:W], ops[W]
        is_ref = smeta == _BIG
    pv, pok = _propagate_nearest(sw, is_ref, reverse=False)
    nv, nok = _propagate_nearest(sw, is_ref, reverse=True)
    c_prev = jnp.where(pok, common_fn(sw, pv), 0)
    c_next = jnp.where(nok, common_fn(sw, nv), 0)
    c = jnp.maximum(c_prev, c_next)
    if n + L < (1 << 24) - 1:
        # back sort on ONE operand: c <= 260 < 256 after capping (exact
        # for all k <= 255 since ms is min(c, k) downstream) packs into the
        # slot id's low byte, halving the back-sort traffic; ref slots pack
        # to the uint32 top so they sort last
        slot = jnp.where(is_ref, jnp.uint32(0xFFFFFF), smeta.astype(jnp.uint32))
        packed = (slot << 8) | jnp.minimum(c, 255).astype(jnp.uint32)
        back = jax.lax.sort((packed,), num_keys=1, is_stable=False)
        return (back[0][:L] & 255).astype(jnp.int32)
    back = jax.lax.sort((smeta, c), num_keys=1, is_stable=False)
    return back[1][:L]


def _dummy_ms(q_words, limit, dummy2, dummy_v):
    """Best min(common-2bit-prefix, v) against the dummy rows; [L] int32."""
    D = dummy_v.shape[0]
    L = q_words[0].shape[0]
    if D == 0:
        return jnp.zeros(L, dtype=jnp.int32)
    W = len(q_words)
    stacked = jnp.stack(dummy2, axis=1)  # [D, W] after transpose of [W, D]

    def body(best, dw):
        d_words, v = dw
        c = _common2(q_words, [jnp.broadcast_to(d_words[w], (L,)) for w in range(W)])
        return jnp.maximum(best, jnp.minimum(c, v)), None

    # derive the init from a varying input so the carry stays axis-varying
    # under shard_map's per-shard type checking
    best0 = (q_words[0] * 0).astype(jnp.int32)
    best, _ = jax.lax.scan(
        body,
        best0,
        (stacked, dummy_v.astype(jnp.int32)),
    )
    return jnp.minimum(best, limit)


def ms2_core(keys2, dummy2, dummy_v, buf, k: int):
    """Value-only MS for every position of a flat code buffer (2-bit join).

    keys2: uint32 [W2, n_kmers]; dummy2: uint32 [W2, D]; dummy_v: int32 [D];
    buf: uint8 [T] with k-1 leading pad entries per query segment. Returns
    ms int32 [T] (entries at pad positions are garbage).
    """
    q_words, limit = pack_windows_2bit(buf, k)
    T = buf.shape[0]
    meta = jnp.arange(T, dtype=jnp.int32)
    ref_words = [keys2[w] for w in range(keys2.shape[0])]
    c = _neighbor_common(ref_words, q_words, meta, _common2)
    ms = jnp.minimum(c, limit)
    d2 = [dummy2[w] for w in range(dummy2.shape[0])]
    ms = jnp.maximum(ms, _dummy_ms(q_words, limit, d2, dummy_v))
    return ms


def ms3_core(keys3, buf, k: int):
    """MS values for every buffer position via the 3-bit (all-rows) join."""
    q_words = pack_windows_3bit(buf, k)
    T = buf.shape[0]
    meta = jnp.arange(T, dtype=jnp.int32)
    ref_words = [keys3[w] for w in range(keys3.shape[0])]
    c = _neighbor_common(ref_words, q_words, meta, _common3)
    return jnp.minimum(c, jnp.int32(k))


def _intervals_from_keys(keys3, q_words, ms):
    """Colex intervals [l, r) of the length-ms prefixes of the given 3-bit
    query keys. ms == 0 yields the empty-pattern interval [0, n_rows)."""
    W = len(q_words)
    P = q_words[0].shape[0]
    n = keys3.shape[1]
    floors, ceils = [], []
    for w in range(W):
        keep = jnp.clip(ms - w * 10, 0, 10).astype(jnp.uint32)
        low_bits = jnp.uint32(30) - 3 * keep
        ones = (jnp.uint32(1) << low_bits) - 1
        floors.append(q_words[w] & ~ones)
        ceils.append(floors[w] | ones)
    # stable order [floor, ceil, ref]: a floor probe sorts before equal
    # reference keys (they belong to its interval); a ceil probe can never
    # equal a reference key (it contains chunk value 7)
    words = [
        jnp.concatenate([floors[w], ceils[w], keys3[w]]) for w in range(W)
    ]
    idx = jnp.arange(P, dtype=jnp.int32)
    meta = jnp.concatenate([idx, idx + P, jnp.full((n,), _BIG, jnp.int32)])
    ops = _radix_sort(words + [meta], W)
    smeta = ops[W]
    is_ref = (smeta == _BIG).astype(jnp.int32)
    before = jnp.cumsum(is_ref) - is_ref  # refs strictly before each slot
    back = jax.lax.sort((smeta, before), num_keys=1, is_stable=False)
    vals = back[1]
    return vals[:P], vals[P : 2 * P]


def intervals3_core(keys3, buf, ms, k: int):
    """Colex intervals [l, r) of each buffer position's matched suffix."""
    return _intervals_from_keys(keys3, pack_windows_3bit(buf, k), ms)


def ms3_batch_vs_seq_core(ref_buf, q_codes, k: int):
    """Per-position MS of a [Q, L] probe batch against a raw sequence.

    The "index" side is the sequence's OWN window keys -- every position of
    ref_buf, 3-bit packed with pad chunk 5, no sorting/dedup/host
    construction (duplicates and $-padded partial windows don't change
    nearest-neighbor common-prefix values, and chunk 5 reproduces '$'
    boundary semantics exactly: it never matches a probe's real chars 1..4
    nor the probe-side pad 7). This powers the reference's
    build-an-index-inside-call() pattern (src/lib.rs:553) on device: the
    variant caller's per-candidate k-mer MS re-runs join directly against
    the reference sequence. Returns ms int32 [Q, L].
    """
    ref_words = pack_windows_3bit(ref_buf, k, pad_chunk=5)
    Q, L = q_codes.shape
    pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
    qbuf = jnp.concatenate([pad, q_codes], axis=1).reshape(-1)
    q_words = pack_windows_3bit(qbuf, k, pad_chunk=7)
    meta = jnp.arange(qbuf.shape[0], dtype=jnp.int32)
    # the sequence-side keys are NOT presorted here, so the concat radix
    # path is required (no merge shortcut)
    c = _neighbor_common(ref_words, q_words, meta, _common3, ref_sorted=False)
    ms = jnp.minimum(c, jnp.int32(k))
    return ms.reshape(Q, L + k - 1)[:, k - 1 :]


_ms3_batch_vs_seq_jit = jax.jit(ms3_batch_vs_seq_core, static_argnames=("k",))


# ---------------------------------------------------------- jit wrappers


@functools.partial(jax.jit, static_argnames=("k",))
def _ms2_jit(keys2, dummy2, dummy_v, buf, k):
    return ms2_core(keys2, dummy2, dummy_v, buf, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _ms3_iv_jit(keys3, buf, k):
    ms = ms3_core(keys3, buf, k)
    l, r = intervals3_core(keys3, buf, ms, k)
    return ms, l, r


def _chunk2_at(words, t):
    """2-bit chunk value at (traced) chunk index t of a 2-bit key list."""
    out = jnp.zeros(t.shape, dtype=jnp.uint32)
    for w in range(len(words)):
        sel = (t >= w * 16) & (t < (w + 1) * 16)
        sh = (jnp.uint32(30) - 2 * (t.astype(jnp.uint32) - w * 16) % 32)
        out = jnp.where(sel, (words[w] >> sh) & 3, out)
    return out


def _intervals2_from_keys(keys2, q_words, ms):
    """Interval [l, r) among the REAL rows of the length-ms prefixes of the
    given 2-bit query keys (floor = pattern + 'A'-fill sorts before equal
    rows; ceil = pattern + 'T'-fill sorts after, with stability order
    [floor, ref, ceil])."""
    W = len(q_words)
    P = q_words[0].shape[0]
    n = keys2.shape[1]
    floors, ceils = [], []
    for w in range(W):
        keep = jnp.clip(ms - w * 16, 0, 16).astype(jnp.uint32)
        lb = jnp.minimum(jnp.uint32(32) - 2 * keep, jnp.uint32(31))
        ones = jnp.where(
            keep == 0,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << lb) - 1,
        )
        floors.append(q_words[w] & ~ones)
        ceils.append(floors[w] | ones)
    idx = jnp.arange(P, dtype=jnp.int32)
    if _use_pallas_merge():
        from kbo_tpu.kernels.pallas_sort import bitonic_merge

        pw = [jnp.concatenate([floors[w], ceils[w]]) for w in range(W)]
        prank = jnp.concatenate(
            [jnp.zeros(P, jnp.int32), jnp.full((P,), 2, jnp.int32)]
        )
        pmeta = jnp.concatenate([idx, idx + P])
        # stable LSD keeps floors before equal-keyed ceils, so the probe
        # side is sorted by (keys, rank) as the merge comparator requires;
        # rank 1 places reference rows between floor and ceil on key ties
        p_ops = _radix_sort(pw + [prank, pmeta], W)
        merged = bitonic_merge(
            [keys2[w] for w in range(W)]
            + [jnp.ones(n, jnp.int32), jnp.full((n,), _BIG, jnp.int32)],
            p_ops,
            n_comps=W + 1,
        )
        smeta = merged[W + 1]
        is_ref = (merged[W] == 1).astype(jnp.int32)
    else:
        words = [
            jnp.concatenate([floors[w], keys2[w], ceils[w]])
            for w in range(W)
        ]
        meta = jnp.concatenate(
            [idx, jnp.full((n,), _BIG, jnp.int32), idx + P]
        )
        ops = _radix_sort(words + [meta], W)
        smeta = ops[W]
        is_ref = (smeta == _BIG).astype(jnp.int32)
    before = jnp.cumsum(is_ref) - is_ref
    back = jax.lax.sort((smeta, before), num_keys=1, is_stable=False)
    vals = back[1]
    return vals[:P], vals[P : 2 * P]


def _interval_dummy_adjust(q_words, ms, dummy2, dummy_v):
    """Counts converting real-row interval ranks to full-row ranks.

    Returns (l_add, r_add): the number of dummy rows colex-before each
    probe's pattern floor, and before its interval end, in TRUE colex
    order ('$' smallest). Exact per-dummy comparison: find the first true
    difference position (capping the raw 2-bit common prefix by the
    dummy's real-suffix length v and the pattern length ms) and compare
    there; a dummy sharing the whole pattern lies inside the interval.
    """
    D = dummy_v.shape[0]
    P = q_words[0].shape[0]
    zeros = jnp.zeros(P, dtype=jnp.int32)
    if D == 0:
        return zeros, zeros
    W = len(q_words)
    stacked = jnp.stack(dummy2, axis=1)  # [D, W]

    def body(carry, dw):
        l_add, r_add = carry
        d_words, v = dw
        db = [jnp.broadcast_to(d_words[w], (P,)) for w in range(W)]
        c2 = _common2(q_words, db)
        tfd = jnp.minimum(jnp.minimum(c2, v), ms)
        inside = tfd == ms
        exhausted = ~inside & (tfd == v)
        dc = _chunk2_at(db, tfd)
        qc = _chunk2_at(q_words, tfd)
        by_chunk = ~inside & ~exhausted & (dc < qc)
        less = (exhausted | by_chunk).astype(jnp.int32)
        return (l_add + less, r_add + less + inside.astype(jnp.int32)), None

    (l_add, r_add), _ = jax.lax.scan(
        body, (zeros + (q_words[0][0] * 0).astype(jnp.int32),
               zeros + (q_words[0][0] * 0).astype(jnp.int32)),
        (stacked, dummy_v.astype(jnp.int32)),
    )
    return l_add, r_add


def ms2_windows_core(keys2, dummy2, dummy_v, windows, k: int):
    """MS + full-row colex intervals for a [P, k] window matrix (2-bit join).

    The sparse interval path: the refinement layers (gap filling, variant
    calling) only ever read intervals at data-dependent candidate
    positions, so the full-length interval pass is never materialized
    (SURVEY §7.3 two-phase sparse refinement). Interval ranks among real
    rows come from a floor/ceil counting pass over the 2-bit keys; dummy
    rows are folded in by the exact per-dummy comparison scan.
    """
    P = windows.shape[0]
    buf = windows.reshape(-1)
    c = ((buf.astype(jnp.uint32) - 1) & 3)
    all_words = []
    for w in range(w2_for_k(k)):
        acc = jnp.zeros(buf.shape[0], dtype=jnp.uint32)
        for j in range(16):
            t = w * 16 + j
            if t >= k:
                break
            acc = acc | (_shift_up_const(c, t, 0) << (30 - 2 * j))
        all_words.append(acc)
    q_words = [w.reshape(P, k)[:, k - 1] for w in all_words]
    # per-row validity: length of the valid run ending at the row's end
    valid = ((windows >= 1) & (windows <= 4))[:, ::-1].astype(jnp.int32)
    limit = jnp.minimum(jnp.sum(jnp.cumprod(valid, axis=1), axis=1), k)

    meta = jnp.arange(P, dtype=jnp.int32)
    ref_words = [keys2[w] for w in range(keys2.shape[0])]
    ms = jnp.minimum(_neighbor_common(ref_words, q_words, meta, _common2), limit)
    d2 = [dummy2[w] for w in range(dummy2.shape[0])]
    ms = jnp.maximum(ms, _dummy_ms(q_words, limit, d2, dummy_v))

    l_real, r_real = _intervals2_from_keys(keys2, q_words, ms)
    l_add, r_add = _interval_dummy_adjust(q_words, ms, d2, dummy_v)
    return ms, l_real + l_add, r_real + r_add


_ms2_windows_jit = jax.jit(ms2_windows_core, static_argnames=("k",))




class DeviceIndex:
    """An SbwtIndex's sort-join key tables resident on a device."""

    def __init__(self, index: SbwtIndex, device=None):
        assert index.keys2 is not None, "index built without join keys"
        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
        self.keys2 = put(np.ascontiguousarray(index.keys2))
        self.keys3 = put(np.ascontiguousarray(index.keys3))
        self.dummy2 = put(np.ascontiguousarray(index.dummy2))
        self.dummy_v = put(np.ascontiguousarray(index.dummy_v))
        self.n_rows = int(index.n_rows)
        self.n_kmers = int(index.n_kmers)
        self.k = int(index.k)


def _bucket(n: int) -> int:
    """Round up to 1/8-octave steps: bounds both compile-shape count and
    pad waste (a pure power-of-two bucket wasted up to 2x sort traffic,
    e.g. an E. coli genome at 4.6M padding to 8.4M)."""
    if n <= 1024:
        return 1024
    p = 1 << (int(n).bit_length() - 1)
    step = p >> 3
    return ((n + step - 1) // step) * step


def make_flat_buffer(codes: np.ndarray, k: int):
    """Sentinel-pad one query into a bucketed flat buffer.

    Returns (buf uint8 [k-1+Lp], L). Window position i of the query is
    buffer position k-1+i.
    """
    L = int(codes.size)
    Lp = _bucket(L)
    buf = np.full(k - 1 + Lp, INVALID, dtype=np.uint8)
    buf[k - 1 : k - 1 + L] = np.asarray(codes, dtype=np.uint8)
    return buf, L


def query_ms_device(index: SbwtIndex | DeviceIndex, codes: np.ndarray):
    """MS values + colex intervals for one encoded query (3-bit join).

    Drop-in device replacement for :func:`kbo_tpu.ops.ms.query_ms_codes`:
    returns (ms int64 [L], intervals int64 [L, 2]).
    """
    dev = index if isinstance(index, DeviceIndex) else DeviceIndex(index)
    buf, L = make_flat_buffer(np.asarray(codes), dev.k)
    ms, l, r = _ms3_iv_jit(dev.keys3, jnp.asarray(buf), dev.k)
    s = slice(dev.k - 1, dev.k - 1 + L)
    ms_np = np.asarray(ms[s], dtype=np.int64)
    iv = np.stack(
        [np.asarray(l[s], dtype=np.int64), np.asarray(r[s], dtype=np.int64)],
        axis=1,
    )
    return ms_np, iv


def query_ms_values_device(index: SbwtIndex | DeviceIndex, codes: np.ndarray):
    """MS values only for one encoded query (fast 2-bit join)."""
    dev = index if isinstance(index, DeviceIndex) else DeviceIndex(index)
    buf, L = make_flat_buffer(np.asarray(codes), dev.k)
    ms = _ms2_jit(dev.keys2, dev.dummy2, dev.dummy_v, jnp.asarray(buf), dev.k)
    return np.asarray(ms[dev.k - 1 : dev.k - 1 + L], dtype=np.int64)


# ------------------------------------------------- device-built seq index


@functools.partial(jax.jit, static_argnames=("k",))
def _seq_keys3_jit(buf, k):
    """Sorted 3-bit window keys of a sequence buffer + distinct full-k-mer
    count. The 'index' is the sequence's own window keys (pad chunk 5, see
    ms3_batch_vs_seq_core) -- sorted here so queries can use the Pallas
    merge; duplicates stay (they don't change nearest-neighbor values)."""
    words = pack_windows_3bit(buf, k, pad_chunk=5)
    # full windows: no pad chunk anywhere == every chunk < 5; checking the
    # top chunk of each word is not enough, so test all words for a 5/7
    # chunk via per-chunk comparison: a window is full iff its 2-bit limit
    # would be k -- recompute cheaply from codes
    valid = (buf >= 1) & (buf <= 4)
    idx = jnp.arange(buf.shape[0], dtype=jnp.int32)
    last_bad = _doubling_cummax(jnp.where(valid, jnp.int32(-1), idx))
    full = ((idx - last_bad) >= k).astype(jnp.int32)
    ops = _radix_sort(list(words) + [full], w3_for_k(k))
    sw, sfull = ops[: w3_for_k(k)], ops[w3_for_k(k)]
    neq = jnp.zeros(buf.shape[0], dtype=bool)
    for w in range(w3_for_k(k)):
        prev = jnp.concatenate([sw[w][:1] ^ jnp.uint32(1), sw[w][:-1]])
        neq = neq | (sw[w] != prev)
    n_kmers = jnp.sum((neq & (sfull == 1)).astype(jnp.int32))
    return tuple(sw) + (n_kmers,)


class DeviceSeqIndex:
    """An ephemeral, device-built find index: the sequence's sorted 3-bit
    window keys. No host SBWT construction -- suitable for one-shot
    ``find`` runs where building the full index dominates wall time.
    Supports the MS value path only (find/matches); map/call refinement
    needs the full :class:`SbwtIndex`.
    """

    def __init__(self, seqs: list[bytes], k: int, add_revcomp: bool = False):
        from kbo_tpu.index.encode import encode_ascii, revcomp_ascii

        parts = []
        for s in seqs:
            s = bytes(s)
            parts.append(encode_ascii(s))
            parts.append(np.array([INVALID], dtype=np.uint8))
            if add_revcomp:
                parts.append(encode_ascii(revcomp_ascii(s)))
                parts.append(np.array([INVALID], dtype=np.uint8))
        codes = np.concatenate(parts[:-1])
        buf, _ = make_flat_buffer(codes, k)
        out = _seq_keys3_jit(jnp.asarray(buf), k)
        self.ref_words = list(out[:-1])
        self.n_kmers = int(out[-1])
        self.k = k


def ms3_values_vs_sorted_seq_core(ref_words, codes, lengths, k: int):
    """Per-position MS of a [Q, L] batch against sorted sequence keys."""
    Q, L = codes.shape
    pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
    buf = jnp.concatenate([pad, codes], axis=1).reshape(-1)
    q_words = pack_windows_3bit(buf, k, pad_chunk=7)
    meta = jnp.arange(buf.shape[0], dtype=jnp.int32)
    c = _neighbor_common(list(ref_words), q_words, meta, _common3)
    ms = jnp.minimum(c, jnp.int32(k))
    return ms.reshape(Q, L + k - 1)[:, k - 1 :]
