"""Device derandomize + translate: parallel reformulations of the reference's
sequential passes.

Derandomize (reference: src/derandomize.rs:269-288) is a right-to-left
recurrence:

    d[i] = k                    if noisy[i] == k
         = noisy[i]             if noisy[i] > t and d[i+1] < noisy[i]
         = d[i+1] - 1           otherwise

In phi-space (phi = d[i] - i) the decrement branch is the identity, the
full-k branch is a constant, and the partial-match branch reduces (using the
+1-Lipschitz property of true matching statistics, noisy[i+1] <= noisy[i]+1)
to a "point function" g(x) = p if x == q else r. Point functions with
constants and identity are closed under composition, so the whole pass is a
parallel suffix scan (Hillis-Steele doubling) -- O(log L) depth, fully
parallel.
The host oracle (ops/derandomize.py) remains the semantic reference; the
equivalence holds for any +1-Lipschitz input, which true MS vectors are.

Translate (reference: src/translate.rs:263-293) is a 3-point stencil plus the
rule that a position already written as the second 'R' of a pair is skipped.
skip obeys skip[p] = A[p] & ~skip[p-1] with A local, i.e. skip alternates
inside maximal runs of A -- computed with one cumulative max (run starts) and
a parity test. Everything else is elementwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kbo_tpu.kernels.ms import _doubling_cummax

# alignment characters encoded as ASCII uint8
_M, _X, _DASH, _R = ord("M"), ord("X"), ord("-"), ord("R")


def _compose(f, g):
    """Composition f o g of (is_id, is_const, q, v, r) function descriptors.

    Descriptor semantics: identity if is_id; else constant v if is_const;
    else point function (x == q ? v : r).
    """
    f_id, f_c, f_q, f_v, f_r = f
    g_id, g_c, g_q, g_v, g_r = g

    # apply f to g's two possible outputs (g_v when x==g_q / matched-or-const,
    # g_r otherwise)
    def apply_f(x):
        return jnp.where(f_id, x, jnp.where(f_c, f_v, jnp.where(x == f_q, f_v, f_r)))

    h_v = apply_f(g_v)
    h_r = apply_f(g_r)
    # resulting descriptor: if g is id, result is f; if g is const, result is
    # const apply_f(g_v); else point function keyed on g_q.
    out_id = f_id & g_id
    out_c = ~out_id & (g_c | (g_id & f_c))
    out_q = jnp.where(g_id, f_q, g_q)
    out_v = jnp.where(g_id, f_v, h_v)
    out_r = jnp.where(g_id, f_r, h_r)
    return (out_id, out_c, out_q, out_v, out_r)


def derandomize_core(noisy: jax.Array, k, threshold, true_len=None) -> jax.Array:
    """Parallel derandomization of a (+1-Lipschitz) noisy MS vector [L].

    ``true_len`` (traced) supports bucket-padded inputs: positions past
    true_len must carry noisy == 0 (identity) and their outputs are garbage
    to be sliced off by the caller.
    """
    noisy = noisy.astype(jnp.int32)
    L = noisy.shape[0]
    if true_len is None:
        true_len = jnp.int32(L)
    idx = jnp.arange(L, dtype=jnp.int32)
    t = jnp.int32(threshold)

    a = noisy - idx  # phi' per position
    is_k = noisy == jnp.int32(k)
    is_soft = (noisy > t) & ~is_k
    # final element: constant vlast - (true_len-1)
    nlast = jnp.take(noisy, true_len - 1)
    vlast = jnp.where(nlast > t, nlast, 0) - (true_len - 1)

    is_id = ~is_k & ~is_soft
    is_const = is_k
    q = a - 1  # soft: x == a-1 ? a-1 : a
    v = jnp.where(is_k, a, a - 1)
    r = a
    # overwrite the final position with the constant vlast
    last = idx == true_len - 1
    is_id = jnp.where(last, False, is_id)
    is_const = jnp.where(last, True, is_const)
    v = jnp.where(last, vlast, v)

    elems = (is_id, is_const, q, v, r)
    comp = _suffix_scan(elems)
    _, c_c, _, c_v, c_r = comp
    # f_{L-1} is a constant, so every suffix composition is a constant: value v
    phi = jnp.where(c_c, c_v, c_r)  # within true_len, c_r is unreachable
    return phi + idx


_IDENT = (True, False, 0, 0, 0)


def _shift_up(x, s: int, fill):
    """x[i] <- x[i + s] (out-of-range filled), static s."""
    return jnp.concatenate(
        [x[s:], jnp.full((s,), fill, dtype=x.dtype)]
    )


def _suffix_scan_flat(elems):
    """Inclusive right-to-left composition scan via Hillis-Steele doubling.

    out[i] = f_i o f_{i+1} o ... o f_{L-1} in ceil(log2(L)) compose steps,
    each a statically-shifted elementwise combine. O(L log L) VPU work (still
    trivial next to the MS kernel) but a small, shallow HLO graph:
    jax.lax.associative_scan's recursive odd/even slicing produced strided
    ops whose XLA:TPU compile time at L=2M ran to minutes.
    """
    L = elems[0].shape[0]
    x = elems
    s = 1
    while s < L:
        shifted = tuple(
            _shift_up(a, s, f) for a, f in zip(x, _IDENT)
        )
        # out[i] = x[i] o x[i + s]: current (left) element applies last
        x = _compose(x, shifted)
        s <<= 1
    return x


_SCAN_BLOCK = 1024


def _suffix_scan(elems):
    """Two-level suffix scan: within-block doubling + a block-total scan +
    one broadcast combine.

    The flat doubling pays ceil(log2(L)) full-length compose passes
    (23 at 4.6M); splitting into S-element blocks pays log2(S) full-length
    passes, a tiny block-level scan, and one combine -- 11 + 1 passes at
    S=1024, measured ~2x on the postprocess derandomize stage. The tail
    pads with identity elements, which compose neutrally on the right.
    """
    L = elems[0].shape[0]
    if L <= 4 * _SCAN_BLOCK:
        return _suffix_scan_flat(elems)
    S = _SCAN_BLOCK
    B = -(-L // S)
    pad = B * S - L
    x = tuple(
        jnp.concatenate([a, jnp.full((pad,), f, a.dtype)]).reshape(B, S)
        for a, f in zip(elems, _IDENT)
    )
    s = 1
    while s < S:
        shifted = tuple(
            jnp.concatenate(
                [a[:, s:], jnp.full((B, s), f, a.dtype)], axis=1
            )
            for a, f in zip(x, _IDENT)
        )
        x = _compose(x, shifted)
        s <<= 1
    # block totals = within[:, 0]; exclusive suffix over blocks
    tot = tuple(a[:, 0] for a in x)
    tot_x = tuple(
        jnp.concatenate([a[1:], jnp.full((1,), f, a.dtype)])
        for a, f in zip(tot, _IDENT)
    )
    s = 1
    while s < B:
        shifted = tuple(
            jnp.concatenate([a[s:], jnp.full((s,), f, a.dtype)])
            for a, f in zip(tot_x, _IDENT)
        )
        tot_x = _compose(tot_x, shifted)
        s <<= 1
    suf = tuple(a[:, None] for a in tot_x)
    out = _compose(x, suf)
    return tuple(a.reshape(B * S)[:L] for a in out)


derandomize_kernel = jax.jit(derandomize_core)


def translate_core(derand: jax.Array, k, threshold, true_len=None) -> jax.Array:
    """Parallel translation of a derandomized MS vector [L] -> uint8 chars."""
    d = derand.astype(jnp.int32)
    L = d.shape[0]
    if true_len is None:
        true_len = jnp.int32(L)
    idx = jnp.arange(L, dtype=jnp.int32)
    t = jnp.int32(threshold)

    prev = jnp.where(idx > 1, jnp.roll(d, 1), jnp.asarray(k, jnp.int32))
    nxt = jnp.where(idx < true_len - 1, jnp.roll(d, -1), d)

    rr = (d > t) & (nxt > 0) & (nxt < t)
    rr_prev = jnp.roll(rr, 1).at[0].set(False)
    A = (idx > 1) & (idx < true_len - 1) & rr_prev
    # skip[p] = A[p] & ~skip[p-1]  => parity within maximal runs of A
    last_false = _doubling_cummax(jnp.where(A, jnp.int32(-1), idx))
    skip = A & (((idx - last_false) & 1) == 1)

    x_char = (nxt == 1) & (prev > 0)
    base = jnp.where(
        rr, _R, jnp.where(d <= 0, jnp.where(x_char, _X, _DASH), _M)
    ).astype(jnp.uint8)
    return jnp.where(skip, jnp.uint8(_R), base)


translate_kernel = jax.jit(translate_core)


def derandomize_ms_device(noisy_ms: np.ndarray, k: int, threshold: int) -> np.ndarray:
    """Device derandomize with host-side numpy I/O."""
    out = derandomize_kernel(
        jnp.asarray(np.asarray(noisy_ms), dtype=jnp.int32),
        jnp.int32(k), jnp.int32(threshold),
    )
    return np.asarray(out, dtype=np.int64)


def translate_ms_device(derand_ms: np.ndarray, k: int, threshold: int) -> list[str]:
    """Device translate with host-side numpy I/O (returns chars)."""
    out = translate_kernel(
        jnp.asarray(np.asarray(derand_ms), dtype=jnp.int32),
        jnp.int32(k), jnp.int32(threshold),
    )
    return [chr(c) for c in np.asarray(out)]


# ------------------------------------------------------- device RLE (find)


def _rle_compact(mask, idx, cap: int):
    """Ascending positions where mask holds, sentinel-padded to `cap`."""
    vals = jnp.where(mask, idx, jnp.int32(0x7FFFFFFF))
    return jax.lax.sort(vals, is_stable=False)[:cap]


def rle_segments_core(chars, lengths, cap: int):
    """Device RLE extraction for ``max_gap_len == 0`` (the `find` default).

    At zero gap tolerance a segment is exactly a maximal run of non-gap
    characters (reference: src/format.rs:143-193 -- a single dash overflows
    immediately and its open/bases back out to zero), so per-segment stats
    reduce to prefix-sum differences at the run boundaries: no full-length
    chars download, just a [Q, 1 + 5*cap] int32 fetch per batch. Layout per
    row: count, then cap columns each of start, end (half-open), matches,
    mismatches, jumps (sentinel 0x7FFFFFFF starts past the count).
    """
    Q, L = chars.shape

    def one(c, n):
        idx = jnp.arange(L, dtype=jnp.int32)
        in_len = idx < n
        is_gap = (c == jnp.uint8(ord("-"))) | (c == jnp.uint8(ord(" ")))
        mask = in_len & ~is_gap
        prev_mask = jnp.concatenate([jnp.zeros((1,), bool), mask[:-1]])
        next_mask = jnp.concatenate([mask[1:], jnp.zeros((1,), bool)])
        seg_start = mask & ~prev_mask
        seg_end = mask & ~next_mask
        aligned = (
            (c == jnp.uint8(ord("M")))
            | (c == jnp.uint8(ord("R")))
            | (c == jnp.uint8(ord("I")))
        )
        # 'D'/'-' are gap_bases in the reference but cannot appear inside a
        # zero-tolerance segment ('D' only exists after map refinement;
        # find chars are M/X/-/R), so non-aligned in-segment chars are
        # mismatches
        prev_r = jnp.concatenate(
            [jnp.zeros((1,), bool), c[:-1] == jnp.uint8(ord("R"))]
        )
        jump = mask & (c == jnp.uint8(ord("R"))) & prev_r
        cm = jnp.cumsum((mask & aligned).astype(jnp.int32))
        cx = jnp.cumsum((mask & ~aligned).astype(jnp.int32))
        cj = jnp.cumsum(jump.astype(jnp.int32))
        count = jnp.sum(seg_start, dtype=jnp.int32)
        starts = _rle_compact(seg_start, idx, cap)
        ends = _rle_compact(seg_end, idx, cap)
        sp = jnp.clip(starts, 0, L - 1)
        ep = jnp.clip(ends, 0, L - 1)
        base = jnp.where(sp > 0, cm[jnp.maximum(sp - 1, 0)], 0)
        base_x = jnp.where(sp > 0, cx[jnp.maximum(sp - 1, 0)], 0)
        base_j = jnp.where(sp > 0, cj[jnp.maximum(sp - 1, 0)], 0)
        return jnp.concatenate(
            [
                count[None],
                starts,
                jnp.where(ends < jnp.int32(0x7FFFFFFF), ep + 1, ends),
                cm[ep] - base,
                cx[ep] - base_x,
                cj[ep] - base_j,
            ]
        )

    return jax.vmap(one)(chars, lengths)


rle_segments = jax.jit(rle_segments_core, static_argnames=("cap",))


def _compact_capped_flat(mask, cap: int):
    """First ``cap`` set positions of a flat mask, ascending, padded with
    0x7FFFFFFF: cumsum + cap-many binary searches (the same
    sparse-output compaction as kernels.mapsweep._compact_mask_capped,
    duplicated here to avoid an import cycle)."""
    big = jnp.int32(0x7FFFFFFF)
    cs = jnp.cumsum(mask.astype(jnp.int32))
    j = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.searchsorted(cs, j + 1, side="left").astype(jnp.int32)
    valid = j < cs[-1]
    return jnp.where(valid, jnp.minimum(pos, mask.shape[0] - 1), big)


def rle_segments_global_core(chars, lengths, cap_total: int):
    """Batch-GLOBAL RLE segment extraction: per-row segment counts plus
    ONE dense segment table shared by all rows.

    The per-row format (:func:`rle_segments_core`) fetches
    ``Q * (1 + 5*cap)`` int32 with ``cap`` sized for the worst row --
    ~740 KB for a 512 x 4096 serving batch whose true segment count is
    ~600 (most rows align in one run). Through a remote host link that
    fetch IS the serving bottleneck. Here the compacted segments of all
    rows share one [5, cap_total] table in row-major order (rows are
    scanned in ascending flat position, so each row's segments are the
    next ``counts[q]`` entries), and the fetch is
    ``1 + Q + 5*cap_total`` int32 -- ~15 KB for the same batch.

    Returns one flat int32 vector: [total, counts[Q],
    start/end/matches/mismatches/jumps x cap_total] with starts/ends
    row-local and half-open, exactly the per-row kernel's semantics.
    ``total`` > cap_total signals overflow (the caller retries bigger).
    """
    Q, L = chars.shape
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_len = idx < lengths[:, None]
    is_gap = (chars == jnp.uint8(ord("-"))) | (chars == jnp.uint8(ord(" ")))
    mask = in_len & ~is_gap
    prev_mask = jnp.concatenate(
        [jnp.zeros((Q, 1), bool), mask[:, :-1]], axis=1
    )
    next_mask = jnp.concatenate(
        [mask[:, 1:], jnp.zeros((Q, 1), bool)], axis=1
    )
    seg_start = mask & ~prev_mask
    seg_end = mask & ~next_mask
    aligned = (
        (chars == jnp.uint8(ord("M")))
        | (chars == jnp.uint8(ord("R")))
        | (chars == jnp.uint8(ord("I")))
    )
    prev_r = jnp.concatenate(
        [jnp.zeros((Q, 1), bool), chars[:, :-1] == jnp.uint8(ord("R"))],
        axis=1,
    )
    jump = mask & (chars == jnp.uint8(ord("R"))) & prev_r
    cm = jnp.cumsum((mask & aligned).astype(jnp.int32), axis=1)
    cx = jnp.cumsum((mask & ~aligned).astype(jnp.int32), axis=1)
    cj = jnp.cumsum(jump.astype(jnp.int32), axis=1)
    counts = jnp.sum(seg_start, axis=1, dtype=jnp.int32)
    total = jnp.sum(counts)

    fs = _compact_capped_flat(seg_start.reshape(-1), cap_total)
    fe = _compact_capped_flat(seg_end.reshape(-1), cap_total)
    valid = fs < jnp.int32(0x7FFFFFFF)
    fs_c = jnp.where(valid, fs, 0)
    fe_c = jnp.where(valid, fe, 0)
    # starts and ends pair 1:1 in flat order (within a row they strictly
    # interleave start <= end < next start; rows concatenate in order)
    q = fs_c // jnp.int32(L)
    sl = fs_c - q * jnp.int32(L)
    el = fe_c - q * jnp.int32(L)
    cmf, cxf, cjf = cm.reshape(-1), cx.reshape(-1), cj.reshape(-1)
    base_ok = sl > 0
    at_prev = jnp.maximum(fs_c - 1, 0)
    bm = jnp.where(base_ok, cmf[at_prev], 0)
    bx = jnp.where(base_ok, cxf[at_prev], 0)
    bj = jnp.where(base_ok, cjf[at_prev], 0)
    big = jnp.int32(0x7FFFFFFF)
    rows = [
        jnp.where(valid, sl, big),
        jnp.where(valid, el + 1, big),
        jnp.where(valid, cmf[fe_c] - bm, 0),
        jnp.where(valid, cxf[fe_c] - bx, 0),
        jnp.where(valid, cjf[fe_c] - bj, 0),
    ]
    return jnp.concatenate([total[None], counts] + rows)


rle_segments_global = jax.jit(
    rle_segments_global_core, static_argnames=("cap_total",)
)
