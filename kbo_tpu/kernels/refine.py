"""Device-side map refinement: variant resolution + gap-fill scoring.

Round-2's sparse-fetch map still paid ~5 relay round trips per call --
packed candidates, gap k-mer texts, anchor k-mer texts, the bidirectional
k-mer MS pair, delta runs -- and at ~100-160 ms per round trip the
refinement fetches dominated end-to-end map (engine 58-106 Mbases/s vs
product 2.7 Mbases/s). This module moves the remaining refinement math
onto the device so the steady-state map pays ONE fetch:

- :func:`resolve_variants_core` -- the full variant pipeline per anchored
  MS drop (reference: src/variant_calling.rs:249-294): reference k-mers
  unpacked from the resident colex key table, query k-mers gathered from
  the resident batch rows, the bidirectional per-k-mer MS re-runs (one via
  a min-identity against the resident sweep row, one as a contig-tagged
  sort-join against the sequence's own window keys), the vectorized
  resolve_variant case analysis (src/variant_calling.rs:139-201), and
  add_variants patch emission (src/translate.rs:350-386).
- :func:`score_gaps_core` -- gap-fill candidate scoring, left extension
  (vectorized binary-search membership probes) and first-success commit
  (reference: src/gap_filling.rs:444-526); only static-budget overflows
  fall back to the exact host evaluator.
- :func:`seq_keys3_tagged_core` -- sorted, contig-tagged 3-bit window keys
  of the [Q, L] reference batch: the join table for the rk-vs-sequence MS
  re-runs (the reference's build-an-index-inside-call(), src/lib.rs:553,
  without the construction).

Multi-contig correctness rides a contig tag carried as a dedicated
LEADING KEY WORD (values in chunk bits 29..0), so the lexicographic sort
groups windows strictly by (contig, key) and the chunk arithmetic of
`_common3` (and its Pallas twin `pallas_join._common_chunks`) adds
exactly 10 chunks for an equal tag word and caps cross-contig common
prefixes at <= 9 -- the caller shifts the clamp caps and the scan result
by that +10 (see ``_TAG_PAD``). Capacity: Q < 2^30 contigs; callers gate
via :func:`max_tag`.

Patch ordering: the host applied patches through a dict (last write wins,
gap fills first, then variants in ascending site order). Scatters with
duplicate indices are UNORDERED in XLA, so patches carry an explicit
priority in bits 8.. of a packed (priority << 8 | ascii) int32 and land
via scatter-max: gap patches priority 1 (mutually disjoint), variant
patches 2 + flat site index (ascending site = ascending priority), host
extras above all (kernels/mapsweep.assemble_map_prio).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kbo_tpu.kernels.ms import (
    INVALID,
    _common3,
    _neighbor_best,
    _radix_sort,
    pack_windows_3bit,
    w3_for_k,
)

# numpy on purpose: module-level jnp scalars/arrays are COMMITTED device
# arrays that capturing jits lift as hidden executable parameters (an XLA
# buffer-count mismatch surfaced when such executables mixed with
# mesh-placed inputs; kernels/mapsweep.py has the incident note). numpy
# constants inline into the HLO as literals.
_BIG32 = np.int32(2**31 - 1)
_OOB = np.uint8(254)  # never equals any reference byte

# chunk value (0..7) -> ASCII; 0 is '$', 5/6/7 are never real row content
# (build pads are 0; sentinel rows are masked upstream) -- map them to 0,
# which never equals a reference byte either
_CHUNK_ASCII = np.asarray(
    [ord("$"), ord("A"), ord("C"), ord("G"), ord("T"), 0, 0, 0],
    dtype=np.uint8,
)


def _chunk_ascii(x):
    """Chunk code (0..7) -> ASCII as five branchless selects: a real
    gather here runs over the kernels' LARGEST intermediates (score_gaps'
    [G, w, k] candidate k-mers are ~6M elements at the 4.6M benchmark)
    and gather volume is what TPU pays for; the select chain is pure VPU.
    Semantics identical to the _CHUNK_ASCII table."""
    out = jnp.where(x == 0, jnp.uint8(ord("$")), jnp.uint8(0))
    for b, ch in enumerate(b"ACGT"):
        out = jnp.where(x == b + 1, jnp.uint8(ch), out)
    return out


def max_tag(k: int) -> int:
    """Largest contig count the tagged join supports (a full tag word in
    chunk bits 29..0)."""
    return 1 << 30


# The contig tag is a dedicated LEADING WORD (values < 2^30, riding the
# same 10x3-bit chunk field as content words). An earlier scheme spread
# 2 tag bits into the spare top bits of EVERY word -- subtly wrong: two
# contigs whose tags differ only in a later word's bits (e.g. tags 1 vs 2
# at W=6) sort interleaved and can count up to 10*(W-1) chunks of phantom
# cross-contig common prefix (caught by the map fuzz matrix,
# tests/test_fuzz_map.py seed 10). With the tag word first, the radix sort
# groups strictly by (tag, key); `_common3` skips the top 2 bits per word,
# so an equal tag word contributes exactly +10 chunks and a differing one
# caps the total at <= 9 -- the caller adds 10 to the clamp caps and
# subtracts 10 from the scan result, which composes exactly through the
# directional min/max clamp scans (every within-group edge inflates by the
# same +10; any cross-group edge drops the path below 10).
_TAG_PAD = 10


def with_revcomp_rows(codes):
    """[Q, L] codes -> [Q, 2L+1] per-row [forward | INVALID | revcomp].

    The reference's ``call`` builds its inner sequence index with the SAME
    BuildOpts as the outer one (src/lib.rs:553), so an ``add_revcomp``
    configuration indexes BOTH strands of the streamed sequence: the
    rk-vs-seq join table must carry the reverse-complement windows too.
    Codes 1..4 complement as 5-c; INVALID (and the separator) pack as
    chunk 5 in the table, so strand-straddling windows join nothing, and
    a reversed row's leading INVALID tail gives the rc text exactly the
    fresh-row '$'-context the inner index's dummy rows would."""
    Q, L = codes.shape
    rc = jnp.where(
        (codes >= 1) & (codes <= 4), jnp.uint8(5) - codes, codes
    )[:, ::-1]
    sep = jnp.full((Q, 1), INVALID, jnp.uint8)
    return jnp.concatenate([codes, sep, rc], axis=1)


def seq_keys3_tagged_core(codes, k: int):
    """Sorted contig-tagged 3-bit window keys of a [Q, L] code batch.

    Pad chunk 5 (the sequence-index convention, kernels.ms
    ms3_values_vs_sorted_seq_core): pads never match probe chars (1..4)
    nor probe pads (7). Windows that straddle a row's leading pad carry a
    5 at distance 0 and join nothing. Q > 1 prepends the tag word (see
    ``_TAG_PAD``); Q == 1 keeps the plain untagged keys (the flagship
    single-genome shape pays nothing).
    """
    Q, L = codes.shape
    pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
    buf = jnp.concatenate([pad, codes], axis=1).reshape(-1)
    stride = L + k - 1
    words = pack_windows_3bit(buf, k, pad_chunk=5)
    if Q > 1:
        # row tag via 2-D iota: an arange // stride would be a genome-wide
        # non-power-of-two integer division (no VPU divide unit)
        tag = jax.lax.broadcasted_iota(
            jnp.uint32, (Q, stride), 0
        ).reshape(-1)
        words = [tag] + list(words)
    return tuple(_radix_sort(words, len(words)))


seq_keys3_tagged = jax.jit(seq_keys3_tagged_core, static_argnames=("k",))

seq_keys3_tagged_rc = jax.jit(
    lambda codes, k: seq_keys3_tagged_core(with_revcomp_rows(codes), k),
    static_argnames=("k",),
)


def unpack_rows3(keys3, rows, k: int, axis: str | None = None):
    """[S] colex rows -> [S, k] chunk codes (0='$', 1..4=ACGT).

    The colex key table IS the packed k-mer text (build pad chunk 0 ==
    '$'), so extraction is a W-word gather + shifts -- no host text, no
    select walk (the device answer to access_kmer, reference sbwt crate
    via src/variant_calling.rs:276).

    With ``axis`` (inside a shard_map over a prefix-sharded table),
    ``keys3`` is this shard's contiguous colex range and ``rows`` are
    GLOBAL indices: each shard contributes its in-range rows (zeros
    elsewhere; '$' chunks never collide because exactly one shard owns
    each row) and a psum assembles the full result.
    """
    W = keys3.shape[0]
    if axis is not None:
        m = keys3.shape[1]
        offset = jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(m)
        local = rows - offset
        in_range = (local >= 0) & (local < m)
        r = jnp.clip(local, 0, m - 1)
    else:
        in_range = None
        r = jnp.maximum(rows, 0)
    # gather each key word ONCE per row (W gathers), then extract the k
    # chunks elementwise -- a per-char keys3[w][r] formulation repeats the
    # same gather up to 10x (gather volume is what TPU pays for)
    words = [keys3[w][r] for w in range(W)]
    cols = []
    for i in range(k):
        t = k - 1 - i  # distance of char i from the window end
        w, j = divmod(t, 10)
        cols.append((words[w] >> jnp.uint32(27 - 3 * j)) & jnp.uint32(7))
    out = jnp.stack(cols, axis=1)
    if axis is not None:
        out = jax.lax.psum(
            jnp.where(in_range[:, None], out, jnp.uint32(0)), axis
        )
    return out.astype(jnp.uint8)


def _pack_codes_matrix(cm, k: int):
    """[N, k] chunk codes (0..7; char 0 first) -> W uint32 word list in the
    colex window-key layout (char at distance t from the END rides word
    t//10 at bits 27-3*(t%10)), i.e. directly comparable against keys3
    columns."""
    words = []
    for w in range(w3_for_k(k)):
        acc = jnp.zeros(cm.shape[0], dtype=jnp.uint32)
        for j in range(10):
            t = w * 10 + j
            if t >= k:
                break
            acc = acc | (
                cm[:, k - 1 - t].astype(jnp.uint32) << jnp.uint32(27 - 3 * j)
            )
        words.append(acc)
    return words


_BUCKET_BITS = 21


def bucket_table(keys3):
    """int32 [2^B] prefix-bucket starts over the colex row set:
    ``tbl[p]`` = first row whose word-0 top B bits are >= p.

    Bucketing by the key's high bits is order-consistent, so the lower
    bound of any probe lies in [tbl[top(probe)], tbl[top(probe)+1]] --
    the binary search starts ~2^B-fold narrower (random-DNA buckets at
    B=21 hold ~n/8k rows: ~10 gather steps instead of ~23 on a genome-
    scale table). Build cost is one scatter-min over the rows plus a
    log-depth backward min-fill; cheap enough to recompute inside each
    jitted consumer (no cross-call table plumbing)."""
    n = keys3.shape[1]
    size = 1 << _BUCKET_BITS
    tops = (keys3[0] >> jnp.uint32(32 - _BUCKET_BITS)).astype(jnp.int32)
    tbl = jnp.full((size,), n, jnp.int32)
    tbl = tbl.at[tops].min(jnp.arange(n, dtype=jnp.int32))
    # empty buckets inherit the next nonempty start (reverse doubling min)
    s = 1
    while s < size:
        tbl = jnp.minimum(
            tbl,
            jnp.concatenate([tbl[s:], jnp.full((s,), n, jnp.int32)]),
        )
        s <<= 1
    return tbl


def _lower_bound_device(keys3, probe_words, tbl=None):
    """Vectorized lower bound of packed probes in the colex row set:
    ~log2(n) gather steps of W words each (~log2(bucket) with a
    :func:`bucket_table`). Sentinel tail rows (0xFFFFFFFF) sort after
    every probe.

    Binary on purpose: an 8-ary variant (8 steps instead of 23, but 7
    pivots per step) measured 0.35 s SLOWER end-to-end at 4.6M on TPU
    v5e -- per-step gather VOLUME, not the serialized step count, is
    what this hardware pays for (tests pin exactness via a bisect
    differential, so the strategy is swappable)."""
    W = keys3.shape[0]
    n = keys3.shape[1]
    N = probe_words[0].shape[0]
    if tbl is None:
        lo = jnp.zeros(N, dtype=jnp.int32)
        hi = jnp.full(N, n, dtype=jnp.int32)
    else:
        top = (probe_words[0] >> jnp.uint32(32 - _BUCKET_BITS)).astype(
            jnp.int32
        )
        size = 1 << _BUCKET_BITS
        lo = tbl[top]
        hi = jnp.where(
            top + 1 < size, tbl[jnp.minimum(top + 1, size - 1)], jnp.int32(n)
        )

    def body(lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        less = jnp.zeros(N, dtype=bool)
        eq = jnp.ones(N, dtype=bool)
        for w in range(W):
            tw = keys3[w][jnp.minimum(mid, jnp.int32(n - 1))]
            less = less | (eq & (tw < probe_words[w]))
            eq = eq & (tw == probe_words[w])
        # converged lanes (lo == hi, incl. lo == n for probes above every
        # key) must not move: the loop would otherwise bisect past the
        # end and return n + 1
        act = lo < hi
        lo = jnp.where(act & less, mid + 1, lo)
        hi = jnp.where(act & ~less, mid, hi)
        return lo, hi

    lo, hi = jax.lax.while_loop(
        lambda lh: jnp.any(lh[0] < lh[1]), body, (lo, hi)
    )
    return lo


def _member_rows_device(keys3, probe_words, axis: str | None = None,
                        tbl=None):
    """Membership of full-length probes in the colex row set: a vectorized
    binary search (rows are distinct length-k strings, so membership is
    equality at the lower bound). Runs inside jit -- the device twin of
    the host gap_filling._member_rows binary search. With ``axis``, each
    shard searches its own colex range and membership is the OR across
    shards (at most one shard owns the row)."""
    W = keys3.shape[0]
    n = keys3.shape[1]
    lo = _lower_bound_device(keys3, probe_words, tbl)
    found = lo < n
    at = jnp.minimum(lo, n - 1)
    eq = jnp.ones(probe_words[0].shape[0], dtype=bool)
    for w in range(W):
        eq = eq & (keys3[w][at] == probe_words[w])
    member = found & eq
    if axis is not None:
        member = jax.lax.psum(member.astype(jnp.int32), axis) > 0
    return member


def _extend_members_device(keys3, prefix, k: int, axis: str | None = None,
                           tbl=None):
    """Membership of the four prepend-variants b+prefix (b = A..T) in one
    binary search per lane instead of four.

    Colex order compares the shared (k-1)-suffix first, so the variants
    that exist are CONSECUTIVE rows, sorted by the prepended char (a '$'
    variant sorts immediately before them): the lower bound of the
    A-variant plus the next three rows covers all four. The prepended
    char rides a single 3-bit field in the packed key, so variant b's
    words differ from the A-variant's by (b-1) << shift in one word --
    4x fewer gather steps than independent searches, measured 0.27 s ->
    ~0.08 s at 16k lanes on a 4.7M-row table. With ``axis``, each shard
    probes its own range (a suffix range that spans a shard boundary
    continues at the next shard's own lower bound) and membership ORs
    across shards. Returns member [4, E] bool."""
    E = prefix.shape[0]
    W = keys3.shape[0]
    n = keys3.shape[1]
    cm1 = jnp.concatenate(
        [jnp.full((E, 1), 1, jnp.uint8), prefix], axis=1
    )
    pw = _pack_codes_matrix(cm1, k)
    wb, jb = divmod(k - 1, 10)
    sb = jnp.uint32(27 - 3 * jb)
    lo = _lower_bound_device(keys3, pw, tbl)
    # gather the four candidate rows once
    rows_w = [
        [keys3[w][jnp.minimum(lo + j, n - 1)] for w in range(W)]
        for j in range(4)
    ]
    in_tab = [(lo + j) < n for j in range(4)]
    members = []
    for b in range(4):
        m = jnp.zeros(E, dtype=bool)
        for j in range(4):
            eq = in_tab[j]
            for w in range(W):
                want = pw[w] if w != wb else pw[w] + (jnp.uint32(b) << sb)
                eq = eq & (rows_w[j][w] == want)
            m = m | eq
        members.append(m)
    member = jnp.stack(members)
    if axis is not None:
        member = jax.lax.psum(member.astype(jnp.int32), axis) > 0
    return member


def left_extend_device(keys3, kmers, budgets, k: int,
                       axis: str | None = None, tbl=None):
    """Batched left extension on device (reference: src/gap_filling.rs:
    205-232, mirroring refine.gap_filling._left_extend_batch): per round,
    prepend each of the four bases to the lane's current (k-1)-prefix and
    extend iff EXACTLY ONE base yields a member row (full-length probes:
    nonempty == singleton == membership).

    kmers: [E, k] chunk codes; budgets: [E] int32 (<= k). Returns
    (exts [E, 2k] chunk codes, LEFT-aligned: char i of the extended
    string; ext_len [E] = k + n_ext)."""
    E, _ = kmers.shape
    prefix0 = kmers[:, : k - 1]
    pre0 = jnp.zeros((E, k), dtype=jnp.uint8)
    n0 = jnp.zeros(E, dtype=jnp.int32)
    act0 = budgets > 0
    cols = jnp.arange(k - 1, dtype=jnp.int32)
    col_k = jnp.arange(k, dtype=jnp.int32)

    def cond(state):
        _, _, _, active = state
        return active.any()

    def body(state):
        prefix, pre, n_ext, active = state
        member = _extend_members_device(keys3, prefix, k, axis, tbl)  # [4, E]
        n_hits = jnp.sum(member.astype(jnp.int32), axis=0)
        choice = jnp.argmax(member, axis=0).astype(jnp.int32)
        ok = active & (n_hits == 1)
        newchar = (choice + 1).astype(jnp.uint8)
        pre = jnp.where(
            ok[:, None] & (col_k[None, :] == n_ext[:, None]),
            newchar[:, None],
            pre,
        )
        shifted = jnp.concatenate(
            [newchar[:, None], prefix[:, :-1]], axis=1
        )
        prefix = jnp.where(ok[:, None], shifted, prefix)
        n_ext = n_ext + ok.astype(jnp.int32)
        active = ok & (n_ext < budgets) & (n_ext < k)
        return prefix, pre, n_ext, active

    _, pre, n_ext, _ = jax.lax.while_loop(
        cond, body, (prefix0, pre0, n0, act0)
    )
    # left-aligned extended string: char i = pre[n_ext-1-i] for i < n_ext,
    # else kmer[i - n_ext]
    i2k = jnp.arange(2 * k, dtype=jnp.int32)[None, :]
    from_pre = i2k < n_ext[:, None]
    pre_idx = jnp.clip(n_ext[:, None] - 1 - i2k, 0, k - 1)
    km_idx = jnp.clip(i2k - n_ext[:, None], 0, k - 1)
    exts = jnp.where(
        from_pre,
        jnp.take_along_axis(pre, pre_idx, axis=1),
        jnp.take_along_axis(kmers, km_idx, axis=1),
    )
    return exts, k + n_ext


# ------------------------------------------- precomputed extension chains


def _shift_key_down(words):
    """(k-1)-key of r[:k-1]: chunk at distance t := r's chunk at distance
    t+1 (drop r's LAST char). Cross-word 3-bit funnel; incoming top chunks
    beyond the key are zero in real row words."""
    W = len(words)
    mask30 = jnp.uint32(0x3FFFFFFF)
    out = []
    for w in range(W):
        v = (words[w] << jnp.uint32(3)) & mask30
        if w + 1 < W:
            v = v | ((words[w + 1] >> jnp.uint32(27)) & jnp.uint32(7))
        out.append(v)
    return out


def build_ext_table_core(keys3, k: int):
    """Canonical left-extension chain of EVERY colex row, precomputed.

    The device extension rule (:func:`left_extend_device`, reference:
    src/gap_filling.rs:205-232) extends a row r by char b iff b + r[:k-1]
    is EXACTLY ONE row -- a pure function of r. So each row has one
    canonical chain parent(r) (the unique such row, -1 when 0 or >=2
    exist), and a lane's extension is simply the first min(budget, k,
    chain length) chars of r's canonical chain. This builds that table
    once per index: a sorted (k-1)-key join pairs every row's dropped-
    last-char key r[:k-1] with every row's dropped-first-char key s[1:]
    (one radix sort of 2n keys), then pointer doubling packs up to k
    chain chars per row. Per-call extension becomes a gather -- the
    while-loop of membership binary searches (one ~30-45ms search per
    round on a genome-scale table) disappears from the map hot path.

    Returns (ext_words uint32 [W, n] -- chain chars packed 3-bit in chain
    order, slot j at word j//10 bits 27-3*(j%10); ext_len int32 [n]).
    """
    W = int(keys3.shape[0])
    n = int(keys3.shape[1])
    words = [keys3[w] for w in range(W)]
    wA, jA = divmod(k - 1, 10)
    shiftA = jnp.uint32(27 - 3 * jA)
    first = (words[wA] >> shiftA) & jnp.uint32(7)
    akeys = list(words)
    akeys[wA] = akeys[wA] & ~(jnp.uint32(7) << shiftA)
    bkeys = _shift_key_down(words)

    rows_idx = jnp.arange(n, dtype=jnp.uint32)
    a_pay = (rows_idx << 8) | (first << 1) | jnp.uint32(1)
    b_pay = rows_idx << 8
    sw = [jnp.concatenate([akeys[w], bkeys[w]]) for w in range(W)]
    pay = jnp.concatenate([a_pay, b_pay])
    ops = _radix_sort(sw + [pay], W)
    sw, pay = ops[:W], ops[W]

    M = 2 * n
    isA = (pay & 1) == 1
    chr3 = ((pay >> 1) & jnp.uint32(7)).astype(jnp.int32)
    row = (pay >> 8).astype(jnp.int32)
    boundary = jnp.zeros(M, dtype=bool).at[0].set(True)
    for w in range(W):
        prev = jnp.concatenate([sw[w][:1] ^ jnp.uint32(1), sw[w][:-1]])
        boundary = boundary | (sw[w] != prev)
    idx = jnp.arange(M, dtype=jnp.int32)
    from kbo_tpu.kernels.ms import _carry_nearest

    start = _carry_nearest(jnp.where(boundary, idx, -1), reverse=False)
    nb = jnp.concatenate([boundary[1:], jnp.ones(1, bool)])
    last = _carry_nearest(jnp.where(nb, idx, -1), reverse=True)

    # per group: count of A slots whose first char is a real base, and the
    # (row, char) of the max such slot (== THE slot when the count is 1)
    a01 = isA & (chr3 >= 1) & (chr3 <= 4)
    S = jnp.cumsum(a01.astype(jnp.int32))
    S_last = S[last]
    S_before = jnp.where(start > 0, S[jnp.maximum(start - 1, 0)], 0)
    cnt = S_last - S_before
    m1 = jnp.where(a01, (row << 3) | chr3, jnp.int32(-1))
    fm = m1
    s = 1
    while s < M:
        fm_sh = jnp.concatenate([jnp.full((s,), -1, jnp.int32), fm[:-s]])
        st_sh = jnp.concatenate([jnp.full((s,), -1, jnp.int32), start[:-s]])
        fm = jnp.maximum(fm, jnp.where(st_sh == start, fm_sh, -1))
        s <<= 1
    gmax = fm[last]

    ok_b = (~isA) & (cnt == 1) & (gmax >= 0)
    tgt = jnp.where(ok_b, row, jnp.int32(n))
    parent = jnp.full(n, -1, jnp.int32).at[tgt].set(
        gmax >> 3, mode="drop"
    )
    pchar = jnp.zeros(n, jnp.uint32).at[tgt].set(
        (gmax & 7).astype(jnp.uint32), mode="drop"
    )

    # pointer doubling: accumulate up to k chain chars per row
    pv = parent >= 0
    ext_len = pv.astype(jnp.int32)
    ew = [jnp.zeros(n, jnp.uint32) for _ in range(W)]
    ew[0] = jnp.where(pv, pchar << jnp.uint32(27), jnp.uint32(0))
    hop = jnp.where(pv, parent, jnp.arange(n, dtype=jnp.int32))
    # rows with no parent contribute length 0 forever (hop = self)
    rounds = max(1, (k - 1).bit_length())
    for _ in range(rounds):
        g_len = ext_len[hop]
        g_words = [ew[w][hop] for w in range(W)]
        shifted = _shift_chain(g_words, ext_len)
        ew = [ew[w] | shifted[w] for w in range(W)]
        ext_len = jnp.minimum(ext_len + g_len, k)
        hop = hop[hop]
    return jnp.stack(ew), ext_len


def _shift_chain(src, e):
    """Shift a 3-bit chain-char stream right by ``e`` chunk slots (per
    lane, dynamic): target word wt chunk j = src chunk 10*wt + j - e.
    Chunks pushed past the last word drop (reads are capped by length)."""
    W = len(src)
    mask30 = jnp.uint32(0x3FFFFFFF)
    q = e // 10
    r = e % 10
    sh_r = (3 * r).astype(jnp.uint32)
    sh_l = (30 - 3 * r).astype(jnp.uint32)
    out = []
    for wt in range(W):
        v = jnp.zeros_like(src[0])
        for ws in range(W):
            if wt - ws >= 0:
                v = v | jnp.where(q == (wt - ws), src[ws] >> sh_r, 0)
            if wt - ws - 1 >= 0:
                v = v | jnp.where(
                    q == (wt - ws - 1), (src[ws] << sh_l) & mask30, 0
                )
        out.append(v)
    return out


build_ext_table = jax.jit(build_ext_table_core, static_argnames=("k",))


def get_ext_table(dev):
    """Lazy per-index extension-chain table (cached on the device index).

    ``KBO_TPU_EXT_TABLE=0`` disables the table (score_gaps falls back to
    the while-loop extension) for differential testing."""
    import os

    if os.environ.get("KBO_TPU_EXT_TABLE", "1") == "0":
        return None
    cached = getattr(dev, "_ext_table", None)
    if cached is None:
        cached = build_ext_table(dev.keys3, dev.k)
        dev._ext_table = cached
    return cached


def ext_from_table(ext_words, ext_len_tab, rows, kmers, budgets, k: int):
    """Table-backed twin of :func:`left_extend_device`: the lane's
    extension is the first min(budget, chain length) chars of its row's
    canonical chain. Returns (exts [E, 2k] chunk codes, ext_len [E])."""
    E = kmers.shape[0]
    W = ext_words.shape[0]
    r = jnp.maximum(rows, 0)
    ce = [ext_words[w][r] for w in range(W)]
    n_ext = jnp.minimum(jnp.maximum(budgets, 0), ext_len_tab[r])
    i2k = jnp.arange(2 * k, dtype=jnp.int32)[None, :]
    # char i < n_ext: chain slot n_ext - 1 - i; else kmer[i - n_ext]
    slot = jnp.maximum(n_ext[:, None] - 1 - i2k, 0)
    sw_, sj = slot // 10, slot % 10
    sh = (jnp.int32(27) - 3 * sj).astype(jnp.uint32)
    chain_char = jnp.zeros((E, 2 * k), jnp.uint32)
    for w in range(W):
        chain_char = chain_char | jnp.where(
            sw_ == w, (ce[w][:, None] >> sh) & jnp.uint32(7), 0
        )
    km_idx = jnp.clip(i2k - n_ext[:, None], 0, k - 1)
    exts = jnp.where(
        i2k < n_ext[:, None],
        chain_char.astype(jnp.uint8),
        jnp.take_along_axis(kmers, km_idx, axis=1),
    )
    return exts, k + n_ext


def _leading_run(eq):
    """Per row: length of the leading True run (eq: [..., T] bool)."""
    return jnp.sum(
        jnp.cumprod(eq.astype(jnp.int32), axis=-1), axis=-1
    ).astype(jnp.int32)


def _trailing_run(eq):
    return _leading_run(eq[..., ::-1])


def _rightmost_peak(ms_mat, d):
    """Per row: rightmost i <= k-2 with ms[i] >= d and ms[i] > ms[i+1],
    else -1 (reference: src/variant_calling.rs:73-83)."""
    mask = (ms_mat[:, :-1] >= d) & (ms_mat[:, :-1] > ms_mat[:, 1:])
    has = mask.any(axis=1)
    w = mask.shape[1]
    last = w - 1 - jnp.argmax(mask[:, ::-1], axis=1).astype(jnp.int32)
    return jnp.where(has, last, -1)


def resolve_variants_core(
    keys3,
    seq_words,
    codes,
    ref_ascii,
    ms,
    lengths,
    drop_pos,
    apos,
    arow,
    d,
    k: int,
    cap_d: int,
    axis: str | None = None,
    d_lo: int = 0,
    seq_axis: str | None = None,
    seq_tables=None,
):
    """Variant patches for every anchored MS drop, fully on device.

    Inputs are the resident sweep outputs: ``ms`` [Q, L] from the 3-bit
    join, ``drop_pos``/``apos``/``arow`` [Q, cap_d] from the postprocess
    stage (kernels/mapsweep.py), ``seq_words`` from
    :func:`seq_keys3_tagged_core`. Returns (patch_pos int32 [S, k] flat
    q*L+i positions with Q*L = inert, patch_prio_val int32 [S, k],
    n_variants int32 scalar) where S = Q*cap_d.

    The two per-k-mer MS re-runs (reference: src/variant_calling.rs:
    279-280) cost no extra join on the query side: the isolated k-mer's
    window at local offset i packs identically to the sweep's window at
    the underlying position (both pad with chunk 7 past the window
    start), and min(lcp, i+1) commutes with the max over rows, so
    ms_kmer[i] == min(ms_row[apos-k+1+i], i+1) exactly. Only the
    reference-k-mer-vs-sequence direction needs a real (tagged) join.

    With ``seq_axis`` (inside a shard_map whose shards each hold the
    tagged window keys of ONE position chunk of the sequence, built from
    chunk + k-1 real left context), the rk-vs-seq join runs against the
    local chunk table and the per-probe best reduces with a pmax: every
    true window is owned by exactly one shard and a chunk-local
    duplicate (a window ending in the context region, left-padded) can
    only score <= the owning shard's exact value, so the max is exact.

    ``seq_tables`` (single-contig only) replaces ``seq_words`` with the
    sweep's OWN sorted query-key tables ``[(words, limits), ...]``
    (kernels.ms.ms3_rows_core ``want_qtable``): the rk-vs-seq join runs
    per chunk table with a max across chunks, and the whole
    seq_keys3_tagged sort -- a genome-sized radix sort per map call --
    disappears. Equivalence of the pad-7 keys under per-window caps:
    a capped LCP can only be inflated past a table window's real run
    length v by pad-7-vs-pad-7 matches, which require every one of the
    window's v real chars to match first, and min(lcp, v) then returns
    exactly the pad-5 value (kernels.ms.window_limits). Exactness of
    the per-chunk max is the ``seq_axis`` argument above.
    """
    Q, L = codes.shape
    S = Q * cap_d
    kk = jnp.int32(k)

    drop = drop_pos[:, :cap_d].reshape(S)
    ap = apos[:, :cap_d].reshape(S)
    ar = arow[:, :cap_d].reshape(S)
    q_of = jnp.arange(S, dtype=jnp.int32) // jnp.int32(cap_d)
    n_q = lengths[q_of]
    valid = (drop < _BIG32) & (ap >= 0)
    site = jnp.where(valid, drop, 0)
    apc = jnp.where(valid, ap, jnp.int32(k - 1))

    # query k-mer (the streamed side's k bases ending at the anchor):
    # ascii window for the common-suffix/variant-char slices, '$' where
    # the window runs past the contig start (src/variant_calling.rs:46-58)
    i_t = jnp.arange(k, dtype=jnp.int32)
    j = apc[:, None] + i_t[None, :] - jnp.int32(k - 1)  # [S, k]
    in_seq = j >= 0
    flat_j = q_of[:, None] * jnp.int32(L) + jnp.maximum(j, 0)
    ref_flat = ref_ascii.reshape(-1)
    qa = jnp.where(in_seq, ref_flat[flat_j], jnp.uint8(ord("$")))

    # ms of the query k-mer vs the INDEX: min-identity against the sweep row
    ms_flat = ms.reshape(-1)
    msr = jnp.where(
        in_seq, jnp.minimum(ms_flat[flat_j], i_t[None, :] + 1), 0
    ).astype(jnp.int32)

    # reference k-mer from the colex key table
    rk = unpack_rows3(keys3, ar, k, axis)  # [S, k] chunks
    ra = _chunk_ascii(rk)

    # ms of the reference k-mer vs THE SEQUENCE (tagged join). The probe
    # buffer pads k-1 slots per row so every window has full context;
    # the pad-straddling window keys are garbage, so DROP them before
    # the join -- the probe side of the sort+merge halves (S*(2k-1) ->
    # S*k keys) for the same sliced result. ``d_lo`` (static, <= d-1)
    # additionally drops the first d_lo offsets: msq feeds only
    # _rightmost_peak(msq, d) and msq[i] <= i+1 < d for i < d-1, so
    # those probes can never produce a peak nor flip a comparison
    # (when both neighbors are < d neither qualifies; when ms[i] >= d
    # and ms[i+1] < d the strict drop holds for ANY value < d).
    kp = k - d_lo
    assert 0 <= d_lo < k
    pad = jnp.full((S, k - 1), INVALID, jnp.uint8)
    pbuf = jnp.concatenate([pad, rk], axis=1).reshape(-1)
    p_words_all = pack_windows_3bit(pbuf, k, pad_chunk=7)
    stride = 2 * k - 1
    p_words = [
        w.reshape(S, stride)[:, k - 1 + d_lo :].reshape(-1)
        for w in p_words_all
    ]
    meta = jnp.arange(S * kp, dtype=jnp.int32)
    if seq_tables is not None:
        assert Q == 1, "sweep-table reuse is single-contig (no tag word)"
        c = None
        for tw, tlim in seq_tables:
            ct = _neighbor_best(
                list(tw), tlim.astype(jnp.int32), p_words, meta, _common3
            )
            c = ct if c is None else jnp.maximum(c, ct)
    else:
        n_seq = seq_words[0].shape[0]
        if Q > 1:
            # leading tag word (see _TAG_PAD): probes join only their own
            # contig's windows; caps and the result shift by the tag word's
            # +10-chunk contribution
            lane = jax.lax.broadcasted_iota(jnp.int32, (S, kp), 0).reshape(-1)
            p_tag = (lane // jnp.int32(cap_d)).astype(jnp.uint32)
            p_words = [p_tag] + p_words
            cap_seq = jnp.full((n_seq,), kk + jnp.int32(_TAG_PAD))
        else:
            cap_seq = jnp.full((n_seq,), kk)
        c = _neighbor_best(list(seq_words), cap_seq, p_words, meta, _common3)
    if seq_axis is not None:
        c = jax.lax.pmax(c, seq_axis)
    if Q > 1:
        c = jnp.maximum(c - jnp.int32(_TAG_PAD), 0)
    msq = jnp.minimum(c, kk).reshape(S, kp)
    if d_lo:
        msq = jnp.concatenate(
            [jnp.zeros((S, d_lo), jnp.int32), msq], axis=1
        )

    # vectorized resolve_variant (src/variant_calling.rs:139-201)
    eqa = qa == ra
    csl = _trailing_run(eqa)
    qpeak = _rightmost_peak(msr, d)
    rpeak = _rightmost_peak(msq, d)
    ok = valid & (csl > 0) & (qpeak >= 0) & (rpeak >= 0)
    sms = kk - csl
    qgap = sms - qpeak - 1
    rgap = sms - rpeak - 1
    subst = ok & (qgap > 0) & (rgap > 0)
    indel = ok & ~subst & (qgap != rgap)
    is_del = indel & (qgap < rgap)  # query overlap larger -> deletion
    is_ins = indel & ~is_del
    vlen = jnp.abs(qgap - rgap)

    # add_variants patch emission (src/translate.rs:350-386 via
    # ops.translate.variant_patches): equal-length substitution writes the
    # reference k-mer's chars; unequal writes uniform-char-or-N over the
    # query-chars length; deletion (empty query chars) writes 'I' at
    # site-1/site; insertion (empty ref chars) writes 'D' per char
    rc_t = jnp.take_along_axis(
        ra, jnp.clip(rpeak[:, None] + 1 + i_t[None, :], 0, k - 1), axis=1
    )
    subst_eq = subst & (qgap == rgap)
    subst_ne = subst & (qgap != rgap)
    in_rc = i_t[None, :] < rgap[:, None]
    all_eq = jnp.sum((in_rc & (rc_t != rc_t[:, :1])), axis=1) == 0
    fill = jnp.where(all_eq, rc_t[:, 0], jnp.uint8(ord("N")))

    npatch = jnp.where(
        subst_eq,
        rgap,
        jnp.where(
            subst_ne, qgap, jnp.where(is_del, 2, jnp.where(is_ins, vlen, 0))
        ),
    )
    base = jnp.where(is_del, site - 1, site)
    val = jnp.where(
        subst_eq[:, None],
        rc_t,
        jnp.where(
            subst_ne[:, None],
            fill[:, None],
            jnp.where(is_del[:, None], jnp.uint8(ord("I")), jnp.uint8(ord("D"))),
        ),
    )
    emit = i_t[None, :] < npatch[:, None]
    pos_local = base[:, None] + i_t[None, :]
    emit = emit & (pos_local >= 0) & (pos_local < n_q[:, None])
    pos = jnp.where(
        emit,
        q_of[:, None] * jnp.int32(L) + pos_local,
        jnp.int32(Q * L),
    )
    # priority 2+s: ascending flat site order == the host's dict order
    prio = 2 + jnp.arange(S, dtype=jnp.int32)
    prio_val = (prio[:, None] << 8) | val.astype(jnp.int32)
    n_variants = jnp.sum((subst | indel).astype(jnp.int32))
    return pos, prio_val, n_variants


def score_gaps_core(
    keys3,
    ref_ascii,
    lengths,
    gap_start,
    gap_end_at,
    grid,
    threshold,
    k: int,
    cap_ge: int,
    cap_ext: int,
    axis: str | None = None,
    ext_tab=None,
    bound=None,
):
    """Gap-fill candidate scoring + first-success commit on device.

    Follows refine/gap_filling._score_candidates phases C-E exactly,
    INCLUDING left extension (:func:`left_extend_device`) and the
    probabilistic acceptance for gaps a single k-mer cannot span
    (``bound`` = log1p(-max_error_prob); reference:
    src/gap_filling.rs:476-509); the first-success scan is
    position-descending across both candidate kinds (reference:
    src/gap_filling.rs:444-526). ``needs_host`` flags only gaps whose
    extension lanes did not fit the static budgets (more than
    ``cap_ext`` case_b lanes overall, or an extension budget beyond k
    chars) or whose width exceeds the [G, k] fill window -- those fall
    back to the exact host evaluator.

    grid: [Q, cap_ge, w] colex row of candidate jpos = search_lo + c
    when unique, else -1 (from kernels.mapsweep.map_postprocess3; the
    static width w <= k+1 comes from the grid's own shape -- the true
    search window never exceeds k - threshold + 1 positions).
    Returns (patch_pos [G, k], patch_prio_val [G, k], needs_host [G] bool,
    counters int32 [3] = gaps_seen, gaps_filled, unfilled_bases) with
    G = Q * cap_ge.
    """
    Q, L = ref_ascii.shape
    G = Q * cap_ge
    w = int(grid.shape[-1])
    t = jnp.int32(threshold)
    kk = jnp.int32(k)

    gs_raw = gap_start[:, :cap_ge].reshape(G)
    ge_raw = gap_end_at[:, :cap_ge].reshape(G)
    q_of = jnp.arange(G, dtype=jnp.int32) // jnp.int32(cap_ge)
    n_q = lengths[q_of]
    real = gs_raw < _BIG32
    gs = jnp.where(real, gs_raw, 0)
    end = jnp.minimum(jnp.where(real, ge_raw, 0), n_q - t)
    gap_len = end - gs
    fits = gap_len + 2 * t <= kk
    radius = kk - jnp.where(fits, t, 0)
    lo = end + t
    hi = jnp.minimum(end + radius, n_q - 1)

    cgrid = grid.reshape(Q, -1, w)[:, :cap_ge].reshape(G, w)
    c_t = jnp.arange(w, dtype=jnp.int32)
    jpos = lo[:, None] + c_t[None, :]
    cand = real[:, None] & (cgrid >= 0) & (jpos <= hi[:, None])

    rows = jnp.maximum(cgrid, 0).reshape(-1)
    km = unpack_rows3(keys3, rows, k, axis).reshape(G, w, k)  # chunks
    ka = _chunk_ascii(km)

    # phase C: overlap run lengths in RAW ASCII space. Candidate c's
    # right window is ref[jpos-k+1 .. jpos] with jpos = lo + c -- the
    # w windows slide by one char, so gather the union span
    # ref[lo-k+1 .. lo+w-2] once per gap ([G, k-1+w]) and build the
    # window stack from static slices (the naive [G, w, k] gather
    # measured ~0.15 s at G=4096 on TPU; the span gather is ~k x smaller)
    ref_flat = ref_ascii.reshape(-1)
    off = jnp.arange(k, dtype=jnp.int32)
    span_pos = (lo - jnp.int32(k - 1))[:, None] + jnp.arange(
        k - 1 + w, dtype=jnp.int32
    )[None, :]
    span_ok = (span_pos >= 0) & (span_pos < n_q[:, None])
    span = jnp.where(
        span_ok,
        ref_flat[
            q_of[:, None] * jnp.int32(L)
            + jnp.clip(span_pos, 0, jnp.int32(L - 1))
        ],
        _OOB,
    )
    right_win = jnp.stack([span[:, c : c + k] for c in range(w)], axis=1)
    rg = _trailing_run((ka == right_win)[:, :, 1:])
    want = jpos - end[:, None] + 1

    lreq = t
    rsp = jnp.maximum(gs - lreq, 0)
    # the left window starts at the gap's left flank regardless of the
    # candidate offset: gather [G, k] once and broadcast over candidates
    # (a [G, k+1, k] gather here measured ~0.15 s at G=4096 on TPU)
    lw_pos = rsp[:, None] + off[None, :]
    lw_ok = lw_pos < n_q[:, None]
    left_win = jnp.where(
        lw_ok,
        ref_flat[q_of[:, None] * jnp.int32(L) + jnp.minimum(lw_pos, jnp.int32(L - 1))],
        _OOB,
    )
    lg = _leading_run(ka == left_win[:, None, :])

    right_ok = cand & (rg >= jnp.minimum(want, kk))
    case_a = right_ok & (lg >= lreq)
    should_extend = kk < lreq + gap_len[:, None] + rg
    case_b = should_extend & right_ok & (lg < lreq)

    # phase D: left extension for the case_b lanes, on device. Lanes are
    # sort-compacted into a static budget; a gap owning a lane that does
    # not fit (cap_ext overflow, or an extension budget beyond k chars)
    # is flagged for the exact host evaluator instead of guessed.
    GC = G * w
    bud = lreq + gap_len[:, None] + rg - kk  # > 0 wherever case_b
    flat_cb = case_b.reshape(-1)
    rank = jnp.cumsum(flat_cb.astype(jnp.int32)) - flat_cb.astype(jnp.int32)
    evaluable = flat_cb & (rank < cap_ext) & (bud.reshape(-1) <= kk)
    dropped = flat_cb & ~evaluable
    fcand = jnp.where(
        evaluable, jnp.arange(GC, dtype=jnp.int32), jnp.int32(GC)
    )
    fc = jax.lax.sort(fcand, is_stable=False)[:cap_ext]
    lane_valid = fc < GC
    fci = jnp.minimum(fc, GC - 1)
    lane_g = fci // jnp.int32(w)
    # re-unpack the lane k-mers from the key table (W gathers of cap_ext
    # each) instead of row-gathering km [cap_ext, k] out of the [G*w*k]
    # candidate stack -- the ext stage's gather volume dominated
    # score_gaps (measured 36 ms of a 59 ms kernel at 4.6M; per-element
    # gathers are what TPU pays for)
    lane_row = rows[fci]
    lane_km = unpack_rows3(keys3, lane_row, k, axis)
    lane_bud = jnp.where(lane_valid, bud.reshape(-1)[fci], 0)
    if ext_tab is not None:
        # precomputed canonical chains: the whole extension is W+1 gathers
        exts, ext_len = ext_from_table(
            ext_tab[0], ext_tab[1], lane_row, lane_km, lane_bud, k
        )
    else:
        tbl = bucket_table(keys3)  # narrows every extension-round search
        exts, ext_len = left_extend_device(
            keys3, lane_km, lane_bud, k, axis, tbl
        )
    # leading match of the extended string vs ref from the gap's left
    # flank (host: _score_candidates phase D). The ref window is gathered
    # ONCE PER GAP ([G, 2k]) and lanes row-gather their gap's window --
    # up to w lanes share a gap, so the per-element gather volume drops
    # w-fold vs per-lane flat gathers
    i2k = jnp.arange(2 * k, dtype=jnp.int32)
    gwin_pos = rsp[:, None] + i2k[None, :]
    gwin = jnp.where(
        gwin_pos < n_q[:, None],
        ref_flat[
            q_of[:, None] * jnp.int32(L)
            + jnp.minimum(gwin_pos, jnp.int32(L - 1))
        ],
        _OOB,
    )
    ref_l = gwin[lane_g]
    avail = (i2k[None, :] < ext_len[:, None]) & (ref_l != _OOB)
    ext_ascii = _chunk_ascii(exts)
    lane_lm = _leading_run(avail & (ext_ascii == ref_l))
    lane_ok = lane_valid & (lane_lm >= lreq)
    ext_ok = (
        jnp.zeros(GC, dtype=bool).at[fc].set(lane_ok, mode="drop")
    ).reshape(G, w)

    # phase E: first success in DESCENDING position order across BOTH
    # candidate kinds (the reference's scan order)
    success = case_a | ext_ok
    has_w = success.any(axis=1)
    cwin = (w - 1) - jnp.argmax(success[:, ::-1], axis=1).astype(jnp.int32)
    cwin = jnp.where(has_w, cwin, -1)
    needs_host = real & dropped.reshape(G, w).any(axis=1)

    sel = jnp.maximum(cwin, 0)[:, None]
    win_is_a = has_w & (jnp.take_along_axis(case_a, sel, axis=1)[:, 0])

    # --- no-extension winner: fill = kmer[start:end]
    lg_w = jnp.take_along_axis(lg, sel, axis=1)[:, 0]
    rg_w = jnp.take_along_axis(rg, sel, axis=1)[:, 0]
    km_w = jnp.take_along_axis(
        km, sel[:, :, None] + jnp.zeros((1, 1, k), jnp.int32), axis=1
    )[:, 0]  # [G, k] chunks of the winning k-mer
    start_a = lg_w - lreq
    end_a = kk - (rg_w - t)
    len_a = end_a - start_a
    i_g = jnp.arange(k, dtype=jnp.int32)
    in_fill_a = (off[None, :] >= start_a[:, None]) & (
        off[None, :] < end_a[:, None]
    )
    dollar_a = jnp.sum(in_fill_a & (km_w == 0), axis=1) > 0
    seg_a = _chunk_ascii(
        jnp.take_along_axis(
            km_w, jnp.clip(start_a[:, None] + t + i_g[None, :], 0, k - 1),
            axis=1,
        )
    )

    # --- extension winner: fill = ext[start:end] from the winning lane
    win_flat = jnp.where(
        has_w, jnp.arange(G, dtype=jnp.int32) * jnp.int32(w) + sel[:, 0],
        jnp.int32(GC),
    )
    li = jnp.clip(jnp.searchsorted(fc, win_flat), 0, cap_ext - 1)
    lane_hit = (fc[li] == win_flat) & has_w & ~win_is_a
    ext_w = exts[li]  # [G, 2k] chunks
    extlen_w = ext_len[li]
    lm_w = lane_lm[li]
    rg_b = jnp.take_along_axis(rg, sel, axis=1)[:, 0]
    start_b = lm_w - lreq
    end_b = extlen_w - (rg_b - t)
    len_b = end_b - start_b
    in_fill_b = (i2k[None, :] >= start_b[:, None]) & (
        i2k[None, :] < end_b[:, None]
    )
    dollar_b = jnp.sum(in_fill_b & (ext_w == 0), axis=1) > 0
    seg_b = _chunk_ascii(
        jnp.take_along_axis(
            ext_w,
            jnp.clip(start_b[:, None] + t + i_g[None, :], 0, 2 * k - 1),
            axis=1,
        )
    )

    fill_len = jnp.where(win_is_a, len_a, len_b)
    has_dollar = jnp.where(win_is_a, dollar_a, dollar_b)
    seg_ascii = jnp.where(win_is_a[:, None], seg_a, seg_b)

    ppos_local = gs[:, None] + i_g[None, :]
    ref_at = ref_flat[
        q_of[:, None] * jnp.int32(L) + jnp.minimum(ppos_local, jnp.int32(L - 1))
    ]

    # acceptance beyond no-indel/no-dollar (reference src/gap_filling.rs:
    # 476-509): a k-mer spanning gap + both flanks is accepted outright
    # (``fits``); otherwise the consecutive-match run probability test
    # (fill_overlaps, :496-506) or the mismatch-flanked pattern
    # (fill_flanked, :507) must pass. The per-run CDF addends come from
    # the SAME host-float64 table as the host evaluator
    # (ops.derandomize.log_rm_max_cdf) and accumulate in ascending run
    # order, so the float64 sum -- and the > bound decision -- is
    # bit-identical to refine.gap_filling._run_log_prob. A gap wider
    # than k cannot represent its match pattern in the [G, k] fill
    # window and is flagged to the exact host evaluator instead.
    in_gap = i_g[None, :] < gap_len[:, None]
    match = in_gap & (seg_ascii == ref_at)
    if bound is None:
        prob_ok = jnp.ones(G, dtype=bool)
    else:
        from kbo_tpu.ops.derandomize import log_rm_max_cdf

        fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        cdf_tbl = jnp.asarray(
            np.asarray(
                [0.0]
                + [log_rm_max_cdf(r + 1, 4, 1) for r in range(1, k + 1)],
                dtype=np.float64,
            ).astype(fdt)
        )
        pairs = match[:, :-1] & match[:, 1:]
        pairs = pairs & (i_g[None, :-1] < (gap_len[:, None] - 1))
        nxt = jnp.concatenate(
            [pairs[:, 1:], jnp.zeros((G, 1), bool)], axis=1
        )
        run_end = pairs & ~nxt
        # a run reaching the final pair never flushes (:505 trailing run)
        ends_final = i_g[None, :-1] == (gap_len[:, None] - 2)
        acc = jnp.zeros(G, fdt)
        rl = jnp.zeros(G, jnp.int32)
        for j in range(k - 1):
            rl = jnp.where(pairs[:, j], rl + 1, 0)
            take = run_end[:, j] & ~ends_final[:, j]
            acc = acc + jnp.where(
                take, cdf_tbl[jnp.minimum(rl, jnp.int32(k))], fdt(0)
            )
        fill_overlaps = acc > jnp.asarray(bound, fdt)
        first_m = match[:, 0]
        last_m = jnp.take_along_axis(
            match, jnp.clip(gap_len - 1, 0, k - 1)[:, None], axis=1
        )[:, 0]
        n_match = jnp.sum(match.astype(jnp.int32), axis=1)
        flanked = (
            (gap_len > 0) & ~first_m & ~last_m & (n_match + 2 == gap_len)
        )
        prob_ok = fill_overlaps | flanked
    needs_host = needs_host | (real & (gap_len > kk))

    accept = (
        real
        & has_w
        & (win_is_a | lane_hit)
        & ~needs_host
        & (fill_len == 2 * t + gap_len)
        & ~has_dollar
        & (fits | prob_ok)
    )

    # paint: 'M' where the filler agrees with the raw reference bytes,
    # the filler nucleotide where it does not (src/gap_filling.rs:511-519)
    emit = accept[:, None] & (i_g[None, :] < gap_len[:, None])
    pval = jnp.where(seg_ascii == ref_at, jnp.uint8(ord("M")), seg_ascii)
    pos = jnp.where(
        emit, q_of[:, None] * jnp.int32(L) + ppos_local, jnp.int32(Q * L)
    )
    prio_val = (jnp.int32(1) << 8) | pval.astype(jnp.int32)

    handled = real & ~needs_host
    clamped = jnp.maximum(jnp.where(handled, gap_len, 0), 0)
    filled = jnp.where(accept, gap_len, 0)
    counters = jnp.stack(
        [
            jnp.sum(handled.astype(jnp.int32)),
            jnp.sum(accept.astype(jnp.int32)),
            jnp.sum(clamped - filled),
        ]
    )
    return pos, prio_val, needs_host, counters


resolve_variants = jax.jit(
    resolve_variants_core,
    static_argnames=("k", "cap_d", "axis", "d_lo", "seq_axis"),
)
score_gaps = jax.jit(
    score_gaps_core, static_argnames=("k", "cap_ge", "cap_ext", "axis")
)


def prob_bound(max_error_prob: float) -> float:
    """log1p(-p) in host float64 -- the acceptance bound the reference
    compares the per-run CDF sum against (src/gap_filling.rs:497)."""
    import math

    return math.log1p(-max_error_prob)
