"""Batched matching statistics on device via sorted k-mer join (JAX/XLA).

TPU-native reformulation of the reference's sequential streaming MS walk
(reference: sbwt crate ``StreamingIndex::matching_statistics``, consumed at
src/index.rs:243-256). Random-access rank queries -- the heart of the
FM/SBWT walk -- are pathological on TPU (XLA serializes gathers), so the
engine never gathers. Instead it exploits that the SBWT row set is exactly
the set of k-windows of the indexed text:

    MS[i] = best over index rows s of min(lcp(window_i, s), cap_s)

where lcp is the common *colex prefix* (packed-integer common prefix, last
char most significant) and cap_s is k for real k-mer rows and the real
suffix length v for '$'-padded dummy rows. That turns MS into: pack window
keys -> sort the query keys -> merge with the presorted reference keys
(Pallas bitonic merge) -> one clamped-LCP scan per direction (Pallas,
kernels/pallas_join.py) -> sort back by position. The hot VALUE path is
sorts and elementwise ops only -- no gathers; the auxiliary paths
(uniqueness lcs lookup in ms3_rows_core, sparse window assembly, the
device build's key gather) use bounded vectorized gathers off the per-
base critical loop. Dummy rows cost nothing extra (ordinary rows with
small caps -- the round-1 engine's O(#dummies * #queries) dummy pass is
gone, so fragmented multi-contig references do not degrade).

Two key spaces:

- **2-bit keys** (16 chars/word): the value hot path (``find``/``matches``/
  the map sweep). Dummy rows pack '$' as chunk 3; the per-row cap makes
  any padding exact (a capped lcp can never credit pad chunks). Query
  windows are capped by ``limit[i]`` = length of the valid-char run ending
  at i (capped at k).

- **3-bit keys** (10 chars/word, '$'=0 < A..T=1..4, query pads=7, raw-
  sequence pads=5): true colex order including dummies. Used for colex
  intervals (floor/ceil probes counted against all rows -- no dummy rank
  adjustment needed) and the index-free vs-seq join (``call()``).

Multi-word keys sort by LSD radix passes of stable single-key ``lax.sort``;
with x64 enabled (kbo_tpu enables it at import) word pairs pack into
uint64 keys, halving the passes (measured 9.8ms -> 5.3ms for the 2-word
sort at 2.36M rows on one v5e).

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
    # word w is word 0 shifted 16w positions (chunk at distance 16w+j of
    # position p = chunk at distance j of position p-16w), so the packing
    # pays 16 shift-or passes + one shift per extra word instead of k
    # passes; the last word masks chunks at distances >= k to stay
    # bit-identical with the per-chunk formulation
    w0 = jnp.zeros(T, dtype=jnp.uint32)
    for j in range(min(16, k)):
        w0 = w0 | (_shift_up_const(c, j, 0) << (30 - 2 * j))
    words = [w0]
    for w in range(1, w2_for_k(k)):
        words.append(_shift_up_const(w0, 16 * w, jnp.uint32(0)))
    jmax = (k - 1) % 16
    if k % 16 and w2_for_k(k) >= 1:
        keep = jnp.uint32(0xFFFFFFFF) << jnp.uint32(30 - 2 * jmax)
        words[-1] = words[-1] & keep
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
    # word w = word 0 shifted 10w positions (see pack_windows_2bit);
    # before-start positions read an all-pad word, and the last word
    # masks distances >= k -- bit-identical to the per-chunk formulation
    w0 = jnp.zeros(T, dtype=jnp.uint32)
    for j in range(min(10, k)):
        w0 = w0 | (_shift_up_const(c, j, pad_chunk) << (27 - 3 * j))
    padw = jnp.uint32(pad_chunk * 0o1111111111)
    words = [w0]
    for w in range(1, w3_for_k(k)):
        words.append(_shift_up_const(w0, 10 * w, padw))
    jmax = (k - 1) % 10
    if k % 10:
        keep = (
            jnp.uint32(0xFFFFFFFF) << jnp.uint32(27 - 3 * jmax)
        ) & jnp.uint32(0x3FFFFFFF)
        words[-1] = words[-1] & keep
    return words


# ------------------------------------------------------- scan primitives


_SCAN_BLOCK = 1024


def _doubling_cummax(x):
    """Inclusive left-to-right cummax: two-level (within-block doubling +
    block-total prefix + one combine), log2(S) + 1 full-length passes
    instead of log2(L) -- the flat doubling paid 23 passes at 4.6M."""
    L = x.shape[0]
    lowest = jnp.iinfo(x.dtype).min
    if L <= 4 * _SCAN_BLOCK:
        s = 1
        while s < L:
            shifted = jnp.concatenate(
                [jnp.full((s,), lowest, x.dtype), x[:-s]]
            )
            x = jnp.maximum(x, shifted)
            s <<= 1
        return x
    S = _SCAN_BLOCK
    B = -(-L // S)
    pad = B * S - L
    xb = jnp.concatenate([x, jnp.full((pad,), lowest, x.dtype)]).reshape(B, S)
    s = 1
    while s < S:
        shifted = jnp.concatenate(
            [jnp.full((B, s), lowest, x.dtype), xb[:, :-s]], axis=1
        )
        xb = jnp.maximum(xb, shifted)
        s <<= 1
    tot = xb[:, -1]  # block maxima
    tot_x = jnp.concatenate([jnp.full((1,), lowest, x.dtype), tot[:-1]])
    s = 1
    while s < B:
        shifted = jnp.concatenate(
            [jnp.full((s,), lowest, x.dtype), tot_x[:-s]]
        )
        tot_x = jnp.maximum(tot_x, shifted)
        s <<= 1
    return jnp.maximum(xb, tot_x[:, None]).reshape(B * S)[:L]


def _carry_nearest(v, reverse: bool):
    """Propagate the nearest source value (entries >= 0) to every slot,
    inclusive. -1 marks non-source slots; slots with no source on the
    scan side keep -1. Two-level like :func:`_doubling_cummax` (the
    combine keeps a slot's own nearest source when one exists inside its
    block -- take-first-set is associative)."""
    L = v.shape[0]

    def flat(v):
        s = 1
        while s < v.shape[-1]:
            if reverse:
                shifted = jnp.concatenate(
                    [v[..., s:], jnp.full(v.shape[:-1] + (s,), -1, v.dtype)],
                    axis=-1,
                )
            else:
                shifted = jnp.concatenate(
                    [jnp.full(v.shape[:-1] + (s,), -1, v.dtype), v[..., :-s]],
                    axis=-1,
                )
            v = jnp.where(v >= 0, v, shifted)
            s <<= 1
        return v

    if L <= 4 * _SCAN_BLOCK:
        return flat(v)
    S = _SCAN_BLOCK
    B = -(-L // S)
    pad = B * S - L
    vb = jnp.concatenate([v, jnp.full((pad,), -1, v.dtype)]).reshape(B, S)
    vb = flat(vb)
    tot = vb[:, 0] if reverse else vb[:, -1]  # nearest source per block
    if reverse:
        tot_x = jnp.concatenate([tot[1:], jnp.full((1,), -1, tot.dtype)])
    else:
        tot_x = jnp.concatenate([jnp.full((1,), -1, tot.dtype), tot[:-1]])
    s = 1
    while s < B:
        if reverse:
            shifted = jnp.concatenate(
                [tot_x[s:], jnp.full((s,), -1, tot.dtype)]
            )
        else:
            shifted = jnp.concatenate(
                [jnp.full((s,), -1, tot.dtype), tot_x[:-s]]
            )
        tot_x = jnp.where(tot_x >= 0, tot_x, shifted)
        s <<= 1
    out = jnp.where(vb >= 0, vb, tot_x[:, None])
    return out.reshape(B * S)[:L]


_IDA = 2**31 - 1
_IDB = -(2**31 - 1)

# slots addressable by the 24-bit id in the single-payload packed join;
# beyond this _neighbor_best switches to the two-operand fallback
# (tests force it lower to exercise the fallback at small sizes)
_PACKED_SLOT_LIMIT = (1 << 24) - 1


def _clamp_scan_jnp(ell, cap, reverse: bool):
    """Inclusive compose scan of clamp transforms x -> max(min(x, ell), cap).

    ell[i] is the edge entering slot i from the scan side; cap[i] = -1 at
    non-source slots. With scan seed -1 the output equals the composed B
    component. Log-depth doubling (see pallas_join.clamp_scan for the
    streaming TPU version and the algebra).
    """
    M = ell.shape[0]
    A, B = ell, cap
    s = 1
    while s < M:
        if reverse:
            Ao = jnp.concatenate([A[s:], jnp.full((s,), _IDA, jnp.int32)])
            Bo = jnp.concatenate([B[s:], jnp.full((s,), _IDB, jnp.int32)])
        else:
            Ao = jnp.concatenate([jnp.full((s,), _IDA, jnp.int32), A[:-s]])
            Bo = jnp.concatenate([jnp.full((s,), _IDB, jnp.int32), B[:-s]])
        A, B = (
            jnp.minimum(Ao, A),
            jnp.maximum(jnp.minimum(Bo, A), B),
        )
        s <<= 1
    return B


# ------------------------------------------------------------ sort-join


def _x64() -> bool:
    try:
        return bool(jax.config.jax_enable_x64)
    except AttributeError:  # pragma: no cover
        return False


def _pack_key_words(words):
    """uint32 word list (most significant first) -> minimal key list.

    With x64 on, adjacent word pairs pack into uint64 keys (half the sort
    passes); otherwise the words themselves are the keys.
    """
    if not _x64():
        return list(words), [1] * len(words)
    keys, spans = [], []
    i = 0
    while i < len(words):
        if i + 1 < len(words):
            keys.append(
                (words[i].astype(jnp.uint64) << 32)
                | words[i + 1].astype(jnp.uint64)
            )
            spans.append(2)
            i += 2
        else:
            keys.append(words[i])
            spans.append(1)
            i += 1
    return keys, spans


def _unpack_key_words(keys, spans):
    words = []
    for kk, sp in zip(keys, spans):
        if sp == 2:
            words.append((kk >> 32).astype(jnp.uint32))
            words.append((kk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
        else:
            words.append(kk)
    return words


def _radix_sort(arrays, n_key_words: int):
    """Stable LSD radix sort of parallel arrays by their first n_key_words
    uint32 word arrays (most significant first).

    Each pass is one stable single-key ``lax.sort`` (a fused num_keys=W
    sort measured minutes of XLA:TPU compile time; single-key passes run
    at ~1.3 TB/s, near HBM bandwidth). With x64, word pairs become uint64
    keys and the pass count halves.
    """
    keys, spans = _pack_key_words(list(arrays[:n_key_words]))
    payloads = list(arrays[n_key_words:])
    ops = keys + payloads
    nk = len(keys)
    for i in range(nk - 1, -1, -1):
        rest = ops[:i] + ops[i + 1 :]
        out = jax.lax.sort(tuple([ops[i]] + rest), num_keys=1, is_stable=True)
        ops = list(out[1 : i + 1]) + [out[0]] + list(out[i + 1 :])
    return _unpack_key_words(ops[:nk], spans) + ops[nk:]


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


def _use_back_scatter() -> bool:
    """Return results to buffer order with a scatter instead of a sort.

    The merged-order -> query-order step has UNIQUE destinations (each
    query slot owns one buffer position; reference slots drop), so a
    single scatter pass could replace a full single-key ``lax.sort`` over
    the merged width -- but MEASURED on TPU v5e it loses: find-core went
    94 -> 187 ms at a 16M merged width (random scattered writes run
    ~170M/s while a single-key sort pass runs ~800M elem/s), consistent
    with the earlier rule that gather/scatter VOLUME is what this
    hardware pays for (rank scatters only won where the destination was
    a few-K compaction buffer). Default stays the sort;
    ``KBO_TPU_BACKSCATTER=1`` re-enables the scatter for measurement."""
    import os

    return os.environ.get("KBO_TPU_BACKSCATTER", "0") == "1"


def _back_to_order(keys, payloads, size: int, fills):
    """Scatter payloads to their key positions (keys >= size drop), or the
    equivalent single-key sort when the scatter path is disabled."""
    if _use_back_scatter():
        out = []
        for p, f in zip(payloads, fills):
            out.append(
                jnp.full((size,), f, p.dtype).at[keys].set(p, mode="drop")
            )
        return out
    back = jax.lax.sort(tuple([keys] + list(payloads)), num_keys=1,
                        is_stable=False)
    return [b[:size] for b in back[1:]]


def _edge_lcp(sw, common_fn, reverse: bool):
    """Adjacent-slot common prefix entering each slot from the scan side."""
    if reverse:
        nb = [
            jnp.concatenate([w[1:], w[-1:] ^ jnp.uint32(0xFFFFFFFF)])
            for w in sw
        ]
    else:
        nb = [
            jnp.concatenate([w[:1] ^ jnp.uint32(0xFFFFFFFF), w[:-1]])
            for w in sw
        ]
    return common_fn(sw, nb)


def _clamp_both(sw, cap, bits: int, common_fn):
    """max of forward/backward clamped-LCP scans (>= 0)."""
    if _use_pallas_merge() and sw[0].shape[0] % (1 << 16) == 0:
        from kbo_tpu.kernels.pallas_join import clamp_scan

        f = clamp_scan(sw, cap, bits, reverse=False)
        b = clamp_scan(sw, cap, bits, reverse=True)
    else:
        f = _clamp_scan_jnp(_edge_lcp(sw, common_fn, False), cap, False)
        b = _clamp_scan_jnp(_edge_lcp(sw, common_fn, True), cap, True)
    return jnp.maximum(jnp.maximum(f, b), 0)


def _neighbor_best(
    ref_words, ref_cap, q_words, q_meta, common_fn, ref_sorted=True
):
    """Best min(lcp, cap) of each query key against the reference keys.

    ref_words: list of W uint32 [n] (colex-sorted when ref_sorted);
    ref_cap: int32 [n] per-row caps in chunk units (1..254);
    q_words/q_meta: query keys and int32 identifiers (< 2**23).
    Returns int32 [L] >= 0 in q_meta order.

    Source identity and the back-sort ride ONE uint32 payload:
    (slot24 << 8) | capbyte, with capbyte 0xFF marking query slots and
    slot24 0xFFFFFF marking reference slots (sorts after every query in
    the back-sort). The scan result overwrites the low byte before the
    back-sort, so the whole value path is W+1 operands end to end.
    """
    bits = 2 if common_fn is _common2 else 3
    W = len(ref_words)
    n = ref_words[0].shape[0]
    L = q_words[0].shape[0]
    if n + L >= _PACKED_SLOT_LIMIT:
        # very large inputs: the single-payload packing has no room for a
        # 24-bit slot id, so carry cap and meta as separate operands (one
        # more radix operand + a two-operand back-sort; correctness first)
        sw = [jnp.concatenate([ref_words[w], q_words[w]]) for w in range(W)]
        cap_all = jnp.concatenate(
            [ref_cap.astype(jnp.int32), jnp.full((L,), -1, jnp.int32)]
        )
        meta_all = jnp.concatenate(
            [jnp.full((n,), _BIG, jnp.int32), q_meta.astype(jnp.int32)]
        )
        ops = _radix_sort(sw + [cap_all, meta_all], W)
        sw, cap_s, meta_s = ops[:W], ops[W], ops[W + 1]
        c = _clamp_both(sw, cap_s, bits, common_fn)
        if _use_back_scatter():
            # ref slots carry meta == _BIG which lands out of range and drops
            return _back_to_order(
                jnp.minimum(meta_s, jnp.int32(L)), [c], L, [0]
            )[0]
        back = jax.lax.sort((meta_s, c), num_keys=1, is_stable=False)
        return back[1][:L]
    sw, spacked, f, b = _merge_scan(
        ref_words, ref_cap, q_words, q_meta, bits, common_fn, ref_sorted
    )
    c = jnp.maximum(jnp.maximum(f, b), 0)
    if _use_back_scatter():
        # query slots own unique buffer positions; ref slots' 0xFFFFFF >= L
        # drops (the slot budget keeps L < 0xFFFFFF)
        return _back_to_order(
            (spacked >> 8).astype(jnp.int32), [c], L, [0]
        )[0]
    out_packed = (spacked & jnp.uint32(0xFFFFFF00)) | jnp.minimum(
        c, 255
    ).astype(jnp.uint32)
    back = jax.lax.sort((out_packed,), num_keys=1, is_stable=False)
    return (back[0][:L] & 255).astype(jnp.int32)


def _merge_scan(ref_words, ref_cap, q_words, q_meta, bits: int, common_fn,
                ref_sorted=True, ref_hi24=None, q_aux=None, a_streams=None):
    """Shared packed merge + directional clamped-LCP scans.

    Packs ref/query slots into the single uint32 payload (see
    :func:`_neighbor_best`'s docstring), merges (Pallas bitonic merge
    against sorted references, or concat + radix), and runs both scan
    directions. Returns (sw, spacked, f, b) in merged order -- the
    building block for both the value join (max of f/b) and the
    row/uniqueness join (f and b separately, kernels ms3_rows_core).

    ``ref_hi24`` (uint32 [n], values < 2**24) optionally replaces the
    constant 0xFFFFFF in the reference slots' high payload bits -- free
    room for per-row data to ride the merge (ms3_rows_core packs the
    adjacent-row LCS pair there). Callers that read the high bits of
    reference slots (none today beyond is_ref, which keys off the low
    byte) must agree on the layout.

    ``q_aux`` (int32 [L]) requests the QUERY-SIDE SORTED TABLE as an
    extra output: the return grows to (sw, spacked, f, b, (q_sorted_words,
    q_aux_sorted)). On the Pallas-merge path the query side is radix-
    sorted anyway (the merge needs it), so the table is free -- the map
    pipeline reuses it as the rk-vs-seq join table instead of re-sorting
    the sequence's window keys (kernels/refine.py resolve_variants).
    Elsewhere it costs one extra payload operand / one extra sort.
    """
    W = len(ref_words)
    if ref_hi24 is None:
        ref_packed = jnp.uint32(0xFFFFFF00) | ref_cap.astype(jnp.uint32)
    else:
        ref_packed = (ref_hi24.astype(jnp.uint32) << 8) | ref_cap.astype(
            jnp.uint32
        )
    q_packed = (q_meta.astype(jnp.uint32) << 8) | jnp.uint32(0xFF)
    qtable = None
    if ref_sorted and _use_pallas_merge():
        import os

        q_extra = [] if q_aux is None else [q_aux]
        q_ops = _radix_sort(list(q_words) + [q_packed] + q_extra, W)
        if q_aux is not None:
            qtable = (tuple(q_ops[:W]), q_ops[W + 1])
            q_ops = q_ops[: W + 1]
        if os.environ.get("KBO_TPU_MERGE_PATH", "1") != "0":
            # exact-size merge: the padded bitonic cascade processes up to
            # 2x phantom elements (pow2 padding; the find shape pads 9.4M
            # -> 16.8M) through every stage AND every downstream scan
            from kbo_tpu.kernels.pallas_sort import merge_path

            merged = merge_path(
                list(ref_words) + [ref_packed], q_ops, n_comps=W,
                a_streams=a_streams,
            )  # tail pads carry 0xFFFFFFFF: non-source, dropped by the
            # back-to-order step
        else:
            from kbo_tpu.kernels.pallas_sort import bitonic_merge

            merged = bitonic_merge(
                list(ref_words) + [ref_packed],
                q_ops,
                n_comps=W,
                slice_output=False,  # pads carry packed 0xFFFFFFFF
            )
        sw, spacked = merged[:W], merged[W]
    else:
        sw = [jnp.concatenate([ref_words[w], q_words[w]]) for w in range(W)]
        spacked = jnp.concatenate([ref_packed, q_packed])
        ops = _radix_sort(sw + [spacked], W)
        sw, spacked = ops[:W], ops[W]
        if q_aux is not None:  # no standalone query sort here: pay for one
            qt_ops = _radix_sort(list(q_words) + [q_aux], W)
            qtable = (tuple(qt_ops[:W]), qt_ops[W])
    capbyte = spacked & jnp.uint32(0xFF)
    cap = jnp.where(capbyte == 0xFF, jnp.int32(-1), capbyte.astype(jnp.int32))
    if _use_pallas_merge() and sw[0].shape[0] % (1 << 16) == 0:
        from kbo_tpu.kernels.pallas_join import clamp_scan

        f = clamp_scan(sw, cap, bits, reverse=False)
        b = clamp_scan(sw, cap, bits, reverse=True)
    else:
        f = _clamp_scan_jnp(_edge_lcp(sw, common_fn, False), cap, False)
        b = _clamp_scan_jnp(_edge_lcp(sw, common_fn, True), cap, True)
    if q_aux is not None:
        return sw, spacked, f, b, qtable
    return sw, spacked, f, b


def ms2_core(keys2, cap2, buf, k: int):
    """Value-only MS for every position of a flat code buffer (2-bit join).

    keys2: uint32 [W2, n_rows] 2-bit keys of ALL rows (real + dummy),
    sorted by 2-bit key; cap2: int32 [n_rows] per-row caps (k for real
    rows, the real-suffix length v for dummies); buf: uint8 [T] with k-1
    leading pad entries per query segment. Returns ms int32 [T] (entries
    at pad positions are garbage).
    """
    q_words, limit = pack_windows_2bit(buf, k)
    T = buf.shape[0]
    meta = jnp.arange(T, dtype=jnp.int32)
    ref_words = [keys2[w] for w in range(keys2.shape[0])]
    c = _neighbor_best(ref_words, cap2, q_words, meta, _common2)
    return jnp.minimum(c, limit)


def ms3_core(keys3, buf, k: int):
    """MS values for every buffer position via the 3-bit (all-rows) join."""
    q_words = pack_windows_3bit(buf, k)
    T = buf.shape[0]
    meta = jnp.arange(T, dtype=jnp.int32)
    ref_words = [keys3[w] for w in range(keys3.shape[0])]
    cap = jnp.full(keys3.shape[1], k, dtype=jnp.int32)
    c = _neighbor_best(ref_words, cap, q_words, meta, _common3)
    return jnp.minimum(c, jnp.int32(k))


def lcs3_from_keys3(keys3, k: int):
    """int32 [n] longest common suffix (in chars, capped at k) between
    colex-adjacent rows; entry 0 is 0. One elementwise pass over the keys
    (the reference's LcsArray semantics, derived from the key table)."""
    prev = [
        jnp.concatenate([w[:1] ^ jnp.uint32(0xFFFFFFFF), w[:-1]])
        for w in keys3
    ]
    # row 0's synthetic predecessor differs in the top bits, where the clz
    # chunk arithmetic yields -1; clamp to the true "no common suffix" 0
    return jnp.clip(_common3(list(keys3), prev), 0, jnp.int32(k))


_lcs3_jit = jax.jit(lcs3_from_keys3, static_argnames=("k",))


def window_limits(buf, k: int):
    """int32 [T]: min(k, length of the valid-char run ending at p) -- the
    per-window cap under which the sweep's pad-7 query keys are an EXACT
    stand-in for the pad-5 sequence-index keys (see
    :func:`seq_table_equivalence` note below): a capped LCP can only be
    inflated past the table window's real suffix by pad-7-vs-pad-7
    matches, and those require the probe's real suffix to be at least as
    long -- in which case the clamp at the run length returns exactly the
    pad-5 value."""
    T = buf.shape[0]
    valid = (buf >= 1) & (buf <= 4)
    idx = jnp.arange(T, dtype=jnp.int32)
    last_bad = _doubling_cummax(jnp.where(valid, jnp.int32(-1), idx))
    return jnp.minimum(jnp.int32(k), idx - last_bad)


def build_rows_merge_streams_core(keys3, lcs3, k: int):
    """Precompute the merge-path A-side streams of the rows join: the ref
    operand list is (keys3 words, packed lcs-pair payload) -- all static
    per index, so the padded row streams the merge kernel DMAs from can
    be built ONCE instead of inside every sweep dispatch (measured ~10 ms
    of pure data movement per 2.36M chunk at 4.6M)."""
    from kbo_tpu.kernels.pallas_sort import build_a_streams

    W = keys3.shape[0]
    n = keys3.shape[1]
    lcs_up = jnp.concatenate([lcs3[1:], jnp.zeros((1,), lcs3.dtype)])
    ref_hi24 = lcs3.astype(jnp.uint32) | (lcs_up.astype(jnp.uint32) << 7)
    ref_packed = (ref_hi24 << 8) | jnp.uint32(min(k, 254))
    return tuple(
        build_a_streams([keys3[w] for w in range(W)] + [ref_packed])
    )


_build_rows_streams_jit = jax.jit(
    build_rows_merge_streams_core, static_argnames=("k",)
)


def get_rows_merge_streams(dev):
    """Lazy per-index merge-path A streams (cached on the device index);
    None off the Pallas-merge path or under KBO_TPU_CACHED_STREAMS=0."""
    import os

    if (
        os.environ.get("KBO_TPU_CACHED_STREAMS", "1") == "0"
        or os.environ.get("KBO_TPU_MERGE_PATH", "1") == "0"
        or not _use_pallas_merge()
    ):
        return None
    cached = getattr(dev, "_rows_streams", None)
    if cached is None:
        cached = _build_rows_streams_jit(dev.keys3, dev.lcs3, dev.k)
        dev._rows_streams = cached
    return cached


def _rows_scan_pieces(keys3, lcs3, buf, k: int, want_qtable: bool = False,
                      a_streams=None):
    """Shared merge + scans of the rows join: per merged slot, the
    directional clamped LCPs, the nearest-left row index, and the
    adjacent-row LCS values at the prospective block edges.

    The adjacent-row LCS pair rides the merge in the reference slots'
    otherwise-constant high payload bits (k < 128 so each value fits 7
    bits): down = lcs3[row] (common suffix with the row below), up =
    lcs3[row + 1] (with the row above; 0 past the table). Carrying them
    through the sort replaces a merged-order gather from the lcs3 table
    -- the suspected XLA:TPU compile-time bomb at genome scale. The
    nearest-source carry scans resolve a missing side to 0 = "no row
    beyond the table edge" (matching a gather formulation's out-of-table
    clamp); left/right-best themselves imply a source row exists.
    """
    W = keys3.shape[0]
    n = keys3.shape[1]
    T = buf.shape[0]
    assert n + T < (1 << 24) - 1, "packed path requires < 16.7M slots"
    assert k < 128, "ms rides 7 bits of the back-sort payload"
    q_words = pack_windows_3bit(buf, k)
    meta = jnp.arange(T, dtype=jnp.int32)
    ref_words = [keys3[w] for w in range(W)]
    ref_cap = jnp.full((n,), jnp.int32(min(k, 254)))
    lcs_up = jnp.concatenate([lcs3[1:], jnp.zeros((1,), lcs3.dtype)])
    ref_hi24 = (
        lcs3.astype(jnp.uint32) | (lcs_up.astype(jnp.uint32) << 7)
    )
    if want_qtable:
        sw, spacked, f, b, qtable = _merge_scan(
            ref_words, ref_cap, q_words, meta, 3, _common3,
            ref_hi24=ref_hi24, q_aux=window_limits(buf, k),
            a_streams=a_streams,
        )
    else:
        qtable = None
        sw, spacked, f, b = _merge_scan(
            ref_words, ref_cap, q_words, meta, 3, _common3,
            ref_hi24=ref_hi24, a_streams=a_streams,
        )
    is_ref = (spacked & jnp.uint32(0xFF)) != 0xFF
    # nearest reference row on each side (colex index = rank among rows);
    # with uniform caps the nearest row attains the best lcp, so the side
    # with the strictly larger lcp holds the matched block's edge row
    xl = jnp.cumsum(is_ref.astype(jnp.int32)) - 1
    down_slot = jnp.where(
        is_ref, ((spacked >> 8) & jnp.uint32(0x7F)).astype(jnp.int32), -1
    )
    up_slot = jnp.where(
        is_ref, ((spacked >> 15) & jnp.uint32(0x7F)).astype(jnp.int32), -1
    )
    near_down = jnp.maximum(_carry_nearest(down_slot, reverse=False), 0)
    near_up = jnp.maximum(_carry_nearest(up_slot, reverse=True), 0)
    return sw, spacked, is_ref, f, b, xl, near_down, near_up, qtable


def ms3_rows_partial_core(keys3, lcs_down, lcs_up_next, row_offset, buf,
                          k: int):
    """Per-shard HALF of the rows join for prefix-sharded index placement.

    ``keys3``/``lcs_down``/``lcs_up_next`` cover a contiguous colex row
    range starting at global row ``row_offset`` (lcs values are GLOBAL:
    lcs_down[i] = lcs3[row_offset + i], lcs_up_next[i] =
    lcs3[row_offset + i + 1], 0 past the table). Returns two int64
    packed reductions per buffer position:

        fpack = (f+1) << 32 | global_x << 8 | down     (0 = no left row)
        bpack = (b+1) << 32 | (2^24-1 - global_x) << 8 | up

    An elementwise max across shards yields the GLOBAL nearest-side
    data: lcp first, then the tie-break picks the row closest to the
    query's true insertion point (largest x on the left side, smallest
    on the right -- a block spanning a shard boundary makes two shards
    report equal lcp). :func:`ms3_rows_from_packed` finishes the
    combine. Exactness argument: per shard, f/b are the clamped LCPs of
    the shard-local nearest rows; the global nearest row on each side
    lives in exactly one shard, attains the global max lcp on that side,
    and ties resolve toward it by construction.
    """
    W = keys3.shape[0]
    n = keys3.shape[1]
    T = buf.shape[0]
    assert n + T < (1 << 24) - 1, "packed path requires < 16.7M slots"
    assert k < 128
    q_words = pack_windows_3bit(buf, k)
    meta = jnp.arange(T, dtype=jnp.int32)
    ref_words = [keys3[w] for w in range(W)]
    ref_cap = jnp.full((n,), jnp.int32(min(k, 254)))
    ref_hi24 = (
        lcs_down.astype(jnp.uint32)
        | (lcs_up_next.astype(jnp.uint32) << 7)
    )
    sw, spacked, f, b = _merge_scan(
        ref_words, ref_cap, q_words, meta, 3, _common3, ref_hi24=ref_hi24
    )
    is_ref = (spacked & jnp.uint32(0xFF)) != 0xFF
    xl = jnp.cumsum(is_ref.astype(jnp.int32)) - 1
    down_slot = jnp.where(
        is_ref, ((spacked >> 8) & jnp.uint32(0x7F)).astype(jnp.int32), -1
    )
    up_slot = jnp.where(
        is_ref, ((spacked >> 15) & jnp.uint32(0x7F)).astype(jnp.int32), -1
    )
    near_down = jnp.maximum(_carry_nearest(down_slot, reverse=False), 0)
    near_up = jnp.maximum(_carry_nearest(up_slot, reverse=True), 0)

    gx_l = (xl + row_offset).astype(jnp.int64)
    gx_r = (xl + 1 + row_offset).astype(jnp.int64)
    fpack = jnp.where(
        f >= 0,
        ((f.astype(jnp.int64) + 1) << 32)
        | (jnp.clip(gx_l, 0, (1 << 24) - 1) << 8)
        | near_down.astype(jnp.int64),
        jnp.int64(0),
    )
    bpack = jnp.where(
        b >= 0,
        ((b.astype(jnp.int64) + 1) << 32)
        | (((1 << 24) - 1 - jnp.clip(gx_r, 0, (1 << 24) - 1)) << 8)
        | near_up.astype(jnp.int64),
        jnp.int64(0),
    )
    # back to buffer order (refs and merge pads land out of range and drop)
    M = sw[0].shape[0]
    sort_key = jnp.where(
        is_ref, jnp.int32(M), (spacked >> 8).astype(jnp.int32)
    )
    fb, bb = _back_to_order(sort_key, [fpack, bpack], T, [0, 0])
    return fb, bb


def ms3_rows_from_packed(fpack, bpack, n_rows, k: int):
    """Finish the sharded rows join: elementwise-max-reduced packs ->
    (ms, uniq, row) with the same semantics as :func:`ms3_rows_core`."""
    kk = jnp.int32(k)
    gf = (fpack >> 32).astype(jnp.int32) - 1
    xf = ((fpack >> 8) & ((1 << 24) - 1)).astype(jnp.int32)
    downf = (fpack & 0xFF).astype(jnp.int32)
    gb = (bpack >> 32).astype(jnp.int32) - 1
    xr = (
        jnp.int32((1 << 24) - 1)
        - ((bpack >> 8) & ((1 << 24) - 1)).astype(jnp.int32)
    )
    upr = (bpack & 0xFF).astype(jnp.int32)
    f = jnp.minimum(gf, kk)
    b = jnp.minimum(gb, kk)
    ms = jnp.maximum(jnp.maximum(f, b), 0)
    left_best = f > b
    right_best = b > f
    x = jnp.where(left_best, xf, xr)
    lcsv = jnp.where(left_best, downf, jnp.where(right_best, upr, 0))
    uniq = (
        (ms > 0)
        & (left_best | right_best)
        & (lcsv < ms)
        & (x >= 0)
        & (x < n_rows)
    )
    return ms, uniq, x


def ms3_rows_core(keys3, lcs3, buf, k: int, want_qtable: bool = False,
                  a_streams=None):
    """(ms, uniq, row) for EVERY buffer position via ONE 3-bit join.

    The colex interval of position i's matched suffix (length ms[i]) has
    width 1 iff, around the query key's insertion point, exactly one
    adjacent row shares a length-ms[i] prefix and the block does not
    extend past it -- an LCS-array identity (the block of rows sharing a
    depth-m prefix is delimited by lcs < m), so uniqueness costs one
    lcs gather instead of the floor/ceil probe pair (whose extra merge
    rows made sparse interval probing cost ~3x the MS sweep itself).

    Returns (ms int32 [T] in [0, k], uniq bool [T], row int32 [T] = the
    colex row of the unique match, valid where uniq). Differential
    reference: engine.compute_ms_intervals_at (floor/ceil counting).

    ``want_qtable`` appends the sorted query-side window keys + per-window
    caps ((words, limits), see :func:`_merge_scan`): the free by-product
    the map path reuses as its rk-vs-seq join table.
    """
    sw, spacked, is_ref, f, b, xl, near_down, near_up, qtable = (
        _rows_scan_pieces(keys3, lcs3, buf, k, want_qtable, a_streams)
    )
    n = keys3.shape[1]
    T = buf.shape[0]
    M = sw[0].shape[0]
    kk = jnp.int32(k)
    f = jnp.minimum(f, kk)
    b = jnp.minimum(b, kk)
    ms_slot = jnp.maximum(jnp.maximum(f, b), 0)
    left_best = f > b
    right_best = b > f
    x = jnp.where(left_best, xl, xl + 1)
    lcsv = jnp.where(left_best, near_down, near_up)
    uniq_slot = (
        (ms_slot > 0)
        & (left_best | right_best)
        & (lcsv < ms_slot)
        & (x >= 0)
        & (x < n)
    )

    # back to query order: key = meta (refs/pads drop), payload packs
    # (row 24b | ms 7b | uniq 1b) -- k < 64 so ms fits 7 bits
    sort_key = jnp.where(is_ref, jnp.int32(M), (spacked >> 8).astype(jnp.int32))
    payload = (
        (jnp.clip(x, 0, n - 1).astype(jnp.uint32) << 8)
        | (ms_slot.astype(jnp.uint32) << 1)
        | uniq_slot.astype(jnp.uint32)
    )
    out = _back_to_order(sort_key, [payload], T, [0])[0]
    ms = ((out >> 1) & jnp.uint32(0x7F)).astype(jnp.int32)
    uniq = (out & 1).astype(bool)
    row = (out >> 8).astype(jnp.int32)
    if want_qtable:
        return ms, uniq, row, qtable
    return ms, uniq, row


def _intervals_from_keys(keys3, q_words, ms):
    """Colex intervals [l, r) of the length-ms prefixes of the given 3-bit
    query keys, counted over ALL rows (dummies included -- the 3-bit key
    space is the true colex order, so no dummy rank adjustment exists).
    ms == 0 yields the empty-pattern interval [0, n_rows)."""
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
    # stable order [floor, ref, ceil]: a floor probe sorts before equal
    # reference keys (they belong to its interval); a ceil probe contains
    # chunk 7 unless ms == k, where the rank component places it after the
    # row equal to the full pattern
    idx = jnp.arange(P, dtype=jnp.int32)
    pw = [jnp.concatenate([floors[w], ceils[w]]) for w in range(W)]
    prank = jnp.concatenate(
        [jnp.zeros(P, jnp.int32), jnp.full((P,), 2, jnp.int32)]
    )
    pmeta = jnp.concatenate([idx, idx + P])
    if _use_pallas_merge():
        import os

        # stable LSD keeps floors before equal-keyed ceils, so the probe
        # side is sorted by (keys, rank) as the merge comparator requires.
        # rank/meta ride as uint32 (all values non-negative, so the order
        # matches int32); merge-path tail pads carry 0xFFFFFFFF -- rank
        # pad != 1 never counts as a ref, meta pad clamps past 2P and
        # drops in the back-to-order step
        p_ops = _radix_sort(
            pw + [prank.astype(jnp.uint32), pmeta.astype(jnp.uint32)], W
        )
        ref_ops = [keys3[w] for w in range(W)] + [
            jnp.ones(n, jnp.uint32),
            jnp.full((n,), _BIG, jnp.uint32),
        ]
        if os.environ.get("KBO_TPU_MERGE_PATH", "1") != "0":
            from kbo_tpu.kernels.pallas_sort import merge_path

            merged = merge_path(ref_ops, p_ops, n_comps=W + 1)
        else:
            from kbo_tpu.kernels.pallas_sort import bitonic_merge

            merged = bitonic_merge(ref_ops, p_ops, n_comps=W + 1)
        smeta = jnp.minimum(merged[W + 1], jnp.uint32(_BIG)).astype(
            jnp.int32
        )
        is_ref = (merged[W] == 1).astype(jnp.int32)
    else:
        words = [
            jnp.concatenate([pw[w], keys3[w]]) for w in range(W)
        ]
        rank = jnp.concatenate([prank, jnp.ones(n, jnp.int32)])
        meta = jnp.concatenate([pmeta, jnp.full((n,), _BIG, jnp.int32)])
        ops = _radix_sort(words + [rank, meta], W + 1)
        smeta = ops[W + 1]
        is_ref = (ops[W] == 1).astype(jnp.int32)
    before = jnp.cumsum(is_ref) - is_ref  # refs strictly before each slot
    vals = _back_to_order(
        jnp.minimum(smeta, jnp.int32(2 * P)), [before], 2 * P, [0]
    )[0]
    return vals[:P], vals[P : 2 * P]


def intervals3_core(keys3, buf, ms, k: int):
    """Colex intervals [l, r) of each buffer position's matched suffix."""
    return _intervals_from_keys(keys3, pack_windows_3bit(buf, k), ms)


def intervals3_windows_core(keys3, windows, ms, k: int):
    """Full-row colex intervals for a [P, k] window matrix given its MS
    values (from the value sweep -- never recomputed here).

    The sparse interval path: the refinement layers (gap filling, variant
    calling) only ever read intervals at data-dependent candidate
    positions (SURVEY §7.3 two-phase sparse refinement).
    """
    P, k_ = windows.shape
    buf = windows.reshape(-1)
    words_all = pack_windows_3bit(buf, k, pad_chunk=7)
    q_words = [w.reshape(P, k)[:, k - 1] for w in words_all]
    return _intervals_from_keys(keys3, q_words, ms.astype(jnp.int32))


_intervals3_windows_jit = jax.jit(
    intervals3_windows_core, static_argnames=("k",)
)


@functools.partial(jax.jit, static_argnames=("k",))
def _intervals3_windows_msrow_jit(keys3, windows, ms_row, pos, k):
    """Sparse interval probe reading MS values from a DEVICE-resident row.

    ms_row: int32 [L] query-coordinate MS values (stays on device -- the
    sparse-fetch map path never downloads it); pos: int32 [Pb] query
    positions (pad entries clipped, their rows are INVALID windows whose
    outputs the caller slices off). Returns one stacked int32 [3, Pb]
    (l, r, ms_at) so the host pays a single fetch.
    """
    ms_at = ms_row[jnp.minimum(pos, jnp.int32(ms_row.shape[0] - 1))]
    l, r = intervals3_windows_core(keys3, windows, ms_at, k)
    return jnp.stack(
        [l.astype(jnp.int32), r.astype(jnp.int32), ms_at.astype(jnp.int32)]
    )


def intervals_at_positions_core(keys3, codes_row, ms_row, pos, k: int):
    """(l, r, ms_at) colex-interval probe at device-resident positions.

    codes_row: uint8 [L] resident code row; ms_row: int32 [L] resident MS
    row; pos: int32 [P]. The [P, k] window matrix is gathered on device
    (one static gather). Usable inside larger jits (the sweep-probe
    fusion) as well as standalone via :func:`_intervals3_pos_jit`.
    """
    ms_at = ms_row[jnp.minimum(pos, jnp.int32(ms_row.shape[0] - 1))]
    offs = jnp.arange(k, dtype=jnp.int32)[None, :] - jnp.int32(k - 1)
    idx = pos[:, None] + offs
    windows = jnp.where(
        idx >= 0,
        codes_row[jnp.maximum(idx, 0)],
        jnp.uint8(INVALID),
    )
    l, r = intervals3_windows_core(keys3, windows, ms_at, k)
    return l.astype(jnp.int32), r.astype(jnp.int32), ms_at.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def _intervals3_pos_jit(keys3, codes_row, ms_row, pos, k):
    """Sparse interval probe with DEVICE-side window assembly; the fetch is
    one stacked int32 [3, Pb] (l, r, ms_at)."""
    l, r, ms_at = intervals_at_positions_core(keys3, codes_row, ms_row, pos, k)
    return jnp.stack([l, r, ms_at])


def ms3_batch_vs_seq_core(ref_buf, q_codes, k: int):
    """Per-position MS of a [Q, L] probe batch against a raw sequence.

    The "index" side is the sequence's OWN window keys -- every position of
    ref_buf, 3-bit packed with pad chunk 5, no sorting/dedup/host
    construction (duplicates and $-padded partial windows don't change
    best-match values, and chunk 5 reproduces '$' boundary semantics
    exactly: it never matches a probe's real chars 1..4 nor the probe-side
    pad 7). This powers the reference's build-an-index-inside-call()
    pattern (src/lib.rs:553) on device: the variant caller's per-candidate
    k-mer MS re-runs join directly against the reference sequence.
    Returns ms int32 [Q, L].
    """
    ref_words = pack_windows_3bit(ref_buf, k, pad_chunk=5)
    Q, L = q_codes.shape
    pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
    qbuf = jnp.concatenate([pad, q_codes], axis=1).reshape(-1)
    q_words = pack_windows_3bit(qbuf, k, pad_chunk=7)
    meta = jnp.arange(qbuf.shape[0], dtype=jnp.int32)
    cap = jnp.full(ref_buf.shape[0], k, dtype=jnp.int32)
    # the sequence-side keys are NOT presorted here, so the concat radix
    # path is required (no merge shortcut)
    c = _neighbor_best(ref_words, cap, q_words, meta, _common3, ref_sorted=False)
    ms = jnp.minimum(c, jnp.int32(k))
    return ms.reshape(Q, L + k - 1)[:, k - 1 :]


_ms3_batch_vs_seq_jit = jax.jit(ms3_batch_vs_seq_core, static_argnames=("k",))


# ---------------------------------------------------------- jit wrappers


@functools.partial(jax.jit, static_argnames=("k",))
def _ms2_jit(keys2, cap2, buf, k):
    return ms2_core(keys2, cap2, buf, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _ms3_iv_jit(keys3, buf, k):
    ms = ms3_core(keys3, buf, k)
    l, r = intervals3_core(keys3, buf, ms, k)
    return ms, l, r


class DeviceIndex:
    """An SbwtIndex's sort-join key tables resident on a device.

    When the index carries its packed construction text, the tables are
    REBUILT on device from it (3 radix sorts, :func:`_build_full_jit`)
    instead of uploaded: the text is ~n bytes while the key tables are
    ~40n, and the relay uplink made the upload dominate one-shot runs
    (~70s for a 2M-base index vs ~2s upload+rebuild). The rebuilt tables
    carry a sentinel tail (rows sorting after every real key and probe --
    query- and interval-neutral); ``KBO_TPU_UPLOAD_INDEX=1`` forces the
    exact host arrays for differential testing.
    """

    def __init__(self, index: SbwtIndex, device=None):
        import os

        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
        text = getattr(index, "text", None)
        rebuilt = False
        if (
            text is not None
            and not index.text_is_access
            and os.environ.get("KBO_TPU_UPLOAD_INDEX", "0") != "1"
        ):
            text = np.asarray(text, dtype=np.uint8)
            # a construction buffer starts with the root segment's k '$'s;
            # an access-chunk text (e.g. a .sbwt-loaded index) does not
            if text.size >= index.k and not text[: index.k].any():
                T = _bucket(int(text.size))
                buf = np.full(T, INVALID, dtype=np.uint8)
                buf[: text.size] = text
                keys3, _row_pos, keys2, cap2, meta = _build_full_jit(
                    put(buf), int(index.k)
                )
                meta = np.asarray(meta)  # one scalar-sized fetch
                rebuilt = (
                    int(meta[0]) == int(index.n_rows)
                    and int(meta[1]) == int(index.n_kmers)
                )
                if rebuilt:
                    self.keys2, self.cap2, self.keys3 = keys2, cap2, keys3
        if not rebuilt:
            assert index.keys2 is not None, "index built without join keys"
            self.keys2 = put(np.ascontiguousarray(index.keys2))
            self.cap2 = put(np.ascontiguousarray(index.cap2))
            self.keys3 = put(np.ascontiguousarray(index.keys3))
        self.lcs3 = _lcs3_jit(self.keys3, int(index.k))
        self.n_rows = int(index.n_rows)
        self.n_kmers = int(index.n_kmers)
        self.k = int(index.k)


def _bucket(n: int, lo: int = 1024) -> int:
    """Round up to 1/8-octave steps: bounds both compile-shape count and
    pad waste (a pure power-of-two bucket wasted up to 2x sort traffic,
    e.g. an E. coli genome at 4.6M padding to 8.4M). The single shared
    implementation (pipeline._bucket delegates here with lo=64)."""
    if n <= lo:
        return lo
    p = 1 << (int(n).bit_length() - 1)
    step = max(1, p >> 3)
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
    # anything already carrying device-resident tables (DeviceIndex,
    # DeviceFullIndex) passes through; only host indexes get wrapped
    dev = DeviceIndex(index) if isinstance(index, SbwtIndex) else index
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
    # anything already carrying device-resident tables (DeviceIndex,
    # DeviceFullIndex) passes through; only host indexes get wrapped
    dev = DeviceIndex(index) if isinstance(index, SbwtIndex) else index
    buf, L = make_flat_buffer(np.asarray(codes), dev.k)
    ms = _ms2_jit(dev.keys2, dev.cap2, jnp.asarray(buf), dev.k)
    return np.asarray(ms[dev.k - 1 : dev.k - 1 + L], dtype=np.int64)


def query_ms_row_device(index: SbwtIndex | DeviceIndex, codes: np.ndarray):
    """Device-RESIDENT int32 MS row for one encoded query (never fetched).

    Callers that only need sparse reads (drop detection, interval probes)
    keep the row on device and fetch compacted results instead of the full
    [L] vector -- through a remote relay the bulk download costs more than
    the sweep itself.
    """
    dev = DeviceIndex(index) if isinstance(index, SbwtIndex) else index
    buf, L = make_flat_buffer(np.asarray(codes), dev.k)
    ms = _ms2_jit(dev.keys2, dev.cap2, jnp.asarray(buf), dev.k)
    return ms[dev.k - 1 : dev.k - 1 + L]


@functools.partial(jax.jit, static_argnames=("cap",))
def _drops_packed_jit(ms_row, d, cap: int):
    """[1 + cap] int32: drop count, then the first `cap` drop positions
    ascending (sentinel-padded). Drop rule = the reference's variant-start
    signal ms[i] < ms[i-1] and ms[i-1] >= d and ms[i] < d
    (src/variant_calling.rs:269)."""
    L = ms_row.shape[0]
    prev = jnp.concatenate([ms_row[:1], ms_row[:-1]])
    idx = jnp.arange(L, dtype=jnp.int32)
    mask = (idx >= 1) & (ms_row < prev) & (prev >= d) & (ms_row < d)
    count = jnp.sum(mask, dtype=jnp.int32)
    vals = jnp.where(mask, idx, jnp.int32(0x7FFFFFFF))
    pos = jax.lax.sort(vals, is_stable=False)[:cap]
    return jnp.concatenate([count[None], pos])


def ms_drops_device(ms_row, d: int, cap0: int = 4096) -> np.ndarray:
    """Drop positions from a device MS row: ONE small fetch (count +
    compacted positions), capacity-doubling retry when the drop count
    exceeds the guess."""
    L = int(ms_row.shape[0])
    cap = min(max(64, cap0), L)
    while True:
        packed = np.asarray(_drops_packed_jit(ms_row, jnp.int32(d), cap))
        count = int(packed[0])
        if count <= cap:
            return packed[1 : 1 + count].astype(np.int64)
        cap = min(cap * 4, L)


# ------------------------------------------------- device-built seq index


@functools.partial(jax.jit, static_argnames=("k",))
def _seq_keys3_jit(buf, k):
    """Sorted 3-bit window keys of a sequence buffer + distinct full-k-mer
    count. The 'index' is the sequence's own window keys (pad chunk 5, see
    ms3_batch_vs_seq_core) -- sorted here so queries can use the Pallas
    merge; duplicates stay (they don't change best-match values)."""
    words = pack_windows_3bit(buf, k, pad_chunk=5)
    # full windows: recompute validity from codes (a window is full iff its
    # valid run reaches k)
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

        assert seqs, "cannot build an index from empty input"
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


def ms3_values_vs_sorted_seq_core(ref_words, codes, k: int):
    """Per-position MS of a [Q, L] batch against sorted sequence keys.

    Tail-pad positions return garbage values; callers mask by length
    downstream (the derandomize pass reads only the true length)."""
    Q, L = codes.shape
    pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
    buf = jnp.concatenate([pad, codes], axis=1).reshape(-1)
    q_words = pack_windows_3bit(buf, k, pad_chunk=7)
    meta = jnp.arange(buf.shape[0], dtype=jnp.int32)
    cap = jnp.full(ref_words[0].shape[0], k, dtype=jnp.int32)
    c = _neighbor_best(list(ref_words), cap, q_words, meta, _common3)
    ms = jnp.minimum(c, jnp.int32(k))
    return ms.reshape(Q, L + k - 1)[:, k - 1 :]


# --------------------------------------------- device-built FULL index


_SENT = np.uint32(0xFFFFFFFF)  # numpy: module-level jnp consts get lifted as executable params


@functools.partial(jax.jit, static_argnames=("k",))
def _build_full_jit(buf, k):
    """Full SBWT join-table construction on device.

    buf: uint8 [T] -- k '$' (0) codes before each maximal ACGT segment
    (tail padding INVALID). Emits the sort-join tables the device query
    paths consume (keys3 colex w/ sentinel tail, keys2+cap2, row
    positions) plus the scalar metadata -- everything stays on device
    except (n_rows, n_kmers, C), because downloading a genome-scale index
    through a TPU host link costs more than building it.

    Row-set semantics match the host build (kbo_tpu/index/build.py): the
    distinct k-windows ending at the root '$' (position k-1) and at every
    ACGT position. Deduplicated duplicates and unselected positions carry
    sentinel keys that sort last and never join (keys3 sentinel sorts
    after every probe/ceil; keys2 sentinel rows have cap 0, which the
    clamped-LCP scan treats as contributing nothing).
    """
    T = buf.shape[0]
    idx = jnp.arange(T, dtype=jnp.int32)
    valid = (buf >= 1) & (buf <= 4)
    w3 = pack_windows_3bit(buf, k, pad_chunk=0)
    last_bad = _doubling_cummax(jnp.where(valid, jnp.int32(-1), idx))
    v = jnp.minimum(jnp.int32(k), idx - last_bad)
    selected = valid | (idx == k - 1)
    w3s = [jnp.where(selected, w, _SENT) for w in w3]

    # sort 1: colex order (sentinels last); payloads ride along
    ops = _radix_sort(list(w3s) + [idx, v], w3_for_k(k))
    sw, spos, sv = ops[: w3_for_k(k)], ops[w3_for_k(k)], ops[w3_for_k(k) + 1]

    is_sent = sw[0] == _SENT
    same_as_prev = jnp.ones(T, dtype=bool)
    for w in sw:
        prev = jnp.concatenate([w[:1] ^ jnp.uint32(1), w[:-1]])
        same_as_prev = same_as_prev & (w == prev)
    keep = ~is_sent & ~same_as_prev

    n_rows = jnp.sum(keep, dtype=jnp.int32)
    n_kmers = jnp.sum(keep & (sv == jnp.int32(k)), dtype=jnp.int32)
    top = sw[0] >> jnp.uint32(27)
    C = jnp.stack(
        [
            jnp.sum(keep & (top <= jnp.uint32(b)), dtype=jnp.int32)
            for b in range(4)
        ]
    )

    # sort 2: push deduplicated duplicates to the sentinel tail (stable;
    # kept keys are distinct, so their colex order is preserved)
    w3k = [jnp.where(keep, w, _SENT) for w in sw]
    ops2 = _radix_sort(list(w3k) + [jnp.where(keep, spos, jnp.int32(-1)),
                                    jnp.where(keep, sv, 0)], w3_for_k(k))
    keys3 = jnp.stack(ops2[: w3_for_k(k)])
    row_pos = ops2[w3_for_k(k)]
    row_v = ops2[w3_for_k(k) + 1]

    # keys2/cap2: 2-bit keys of the kept rows, gathered by position and
    # sorted; sentinel rows get cap 0 (inert in the clamped-LCP scan)
    w2_all, _ = pack_windows_2bit(buf, k)
    kept2 = row_pos >= 0
    posc = jnp.maximum(row_pos, 0)
    w2g = [
        jnp.where(kept2, w[posc], _SENT) for w in w2_all
    ]
    cap = jnp.where(kept2, jnp.minimum(row_v, k), 0).astype(jnp.int32)
    ops3 = _radix_sort(list(w2g) + [cap], w2_for_k(k))
    keys2 = jnp.stack(ops3[: w2_for_k(k)])
    cap2 = ops3[w2_for_k(k)]

    meta = jnp.concatenate([jnp.stack([n_rows, n_kmers]), C])
    return keys3, row_pos, keys2, cap2, meta


@functools.partial(jax.jit, static_argnames=("k",))
def _member_widths_jit(keys3, windows, k):
    """Colex interval widths of full-length [P, k] probe windows (0 or 1:
    rows are distinct length-k strings). Membership test for the gap
    filler's left extension against a device-resident index."""
    P = windows.shape[0]
    ms = jnp.full((P,), k, dtype=jnp.int32)
    l, r = intervals3_windows_core(keys3, windows, ms, k)
    return (r - l).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def _gather_i32_jit(arr, pos):
    return arr[jnp.maximum(pos, 0)]


class DeviceFullIndex:
    """A fully device-built, device-resident SBWT index.

    Supports the complete device query surface (find/matches/map/call):
    the sort-join value path (keys2/cap2), sparse interval probes and
    membership search (keys3), and k-mer extraction (row positions
    gathered on device + host text slice). The rank-bitvector form
    (bits/cum) is never materialized -- nothing in the device execution
    model uses rank queries, and downloading genome-scale tables through
    the host link costs more than this build. Construction is 3 radix
    sorts on device (reference build path: src/index.rs:56-99).
    """

    def __init__(self, seqs: list[bytes], k: int, add_revcomp: bool = False):
        from kbo_tpu.index.encode import (
            encode_ascii,
            revcomp_ascii,
            split_segments,
        )

        assert 1 < k < 64
        parts = []
        for s in seqs:
            s = bytes(s)
            segs = split_segments(encode_ascii(s))
            if add_revcomp:
                segs += split_segments(encode_ascii(revcomp_ascii(s)))
            for seg in segs:
                parts.append(np.zeros(k, dtype=np.uint8))
                parts.append(seg)
        assert parts, "cannot build an index from empty input"
        text = np.concatenate(parts)
        T = _bucket(text.size)
        buf = np.full(T, INVALID, dtype=np.uint8)
        buf[: text.size] = text
        keys3, row_pos, keys2, cap2, meta = _build_full_jit(
            jnp.asarray(buf), k
        )
        self.keys3 = keys3
        self.row_pos = row_pos
        self.keys2 = keys2
        self.cap2 = cap2
        self.lcs3 = _lcs3_jit(keys3, k)
        self.text = text  # host copy of the construction buffer
        meta = np.asarray(meta)  # ONE scalar-sized fetch
        self.n_rows = int(meta[0])
        self.n_kmers = int(meta[1])
        self.C = meta[2:6].astype(np.int32)
        self.k = k

    def alphabet(self) -> bytes:
        return b"ACGT"

    def access_kmers_codes(self, rows: np.ndarray) -> np.ndarray:
        """[R, k] code matrix of colex rows: row positions gather on
        device (small fetch), text slicing on host."""
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        if rows.size and (rows.min() < 0 or rows.max() >= self.n_rows):
            # rows in the sentinel tail carry row_pos == -1; slicing with
            # it would WRAP into the text end and return plausible garbage
            raise IndexError(
                f"colex row out of range [0, {self.n_rows})"
            )
        pos = np.asarray(
            _gather_i32_jit(self.row_pos, jnp.asarray(rows, jnp.int32)),
            dtype=np.int64,
        )
        offs = np.arange(-self.k + 1, 1, dtype=np.int64)
        return self.text[pos[:, None] + offs[None, :]]

    def access_kmer_codes(self, row: int) -> np.ndarray:
        return self.access_kmers_codes(np.asarray([row]))[0]

    def access_kmer(self, row: int) -> bytes:
        from kbo_tpu.index.encode import decode_codes

        return decode_codes(self.access_kmer_codes(int(row)))

    def member_widths(self, probes: np.ndarray) -> np.ndarray:
        """Interval widths (0/1) of [P, k] full-length code probes."""
        probes = np.asarray(probes, dtype=np.uint8)
        P = probes.shape[0]
        Pb = 64
        while Pb < P:
            Pb <<= 1
        if Pb != P:
            probes = np.concatenate(
                [probes, np.full((Pb - P, self.k), INVALID, np.uint8)]
            )
        w = np.asarray(_member_widths_jit(self.keys3, jnp.asarray(probes),
                                          self.k))
        return w[:P]
