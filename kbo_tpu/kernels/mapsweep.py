"""Sparse-fetch map pipeline kernels: fused sweep + refinement probes and
delta-encoded output assembly.

The map path (reference: src/lib.rs:720-761) interleaves a dense sweep with
data-dependent refinement. Device->host transfers through a TPU host (and
especially through this environment's relay) are the end-to-end bottleneck,
so the execution model never fetches a full-length array and runs the whole
pre-refinement phase as ONE device program:

1. :func:`map_sweep_compact3_core` computes MS + per-position interval
   uniqueness + matched colex rows from a single 3-bit sort-join
   (kernels.ms.ms3_rows_core), then derandomize + translate, compacts the
   refinement candidates on device -- MS drop sites (variant calling,
   reference: src/variant_calling.rs:268-269) and gap runs of the
   translation (gap filling, src/gap_filling.rs:466-475) -- and resolves
   the variant anchors and gap unique-context grids as pure gathers from
   the dense join outputs. One packed int32 fetch carries everything the
   host refinement needs; the dense ``chars``/``ms`` arrays stay resident.
2. The host refinement layers (vectorized acceptance math, lane-batched
   left extension, batched candidate k-mer MS re-runs) produce a small
   list of (position, char) patches.
3. :func:`assemble_map_core` scatters the patches into the device-resident
   translation, applies ``relative_to_ref`` (reference: src/format.rs:266-287)
   on device, and emits the output as *deltas against the reference* (map
   output is ~99.9% equal to the reference sequence); the host reconstructs
   the full bytes from ref + deltas.

:func:`map_sweep_compact_core` (2-bit join, no interval outputs) remains
the mesh-sharded path's sweep. Compaction is sort-based (positions of
mask -> stable ascending order), which is TPU-friendly: one single-key
``lax.sort`` instead of a serialized gather/scatter. All shapes are
static; capacities are bucketed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kbo_tpu.kernels.ms import INVALID, ms2_core
from kbo_tpu.kernels.postprocess import derandomize_core, translate_core

# numpy on purpose: a module-level jnp scalar is a COMMITTED device array
# that every capturing jit lifts as a hidden executable parameter -- mixing
# those executables with mesh-placed inputs hit an XLA buffer-count
# mismatch ("supplied 7 buffers but compiled program expected 8"). A numpy
# scalar inlines into the HLO as a literal.
_BIG32 = np.int32(2**31 - 1)
_M, _X, _DASH = ord("M"), ord("X"), ord("-")


def pack_ascii_host(ref_mat, lengths):
    """Host side of the packed reference upload: [Q, L] raw ASCII
    (0-padded rows) -> (packed4 uint8 [Q, L//4], exc_pos int32, exc_byte
    uint8). ``decode_packed4_device`` reconstructs the exact raw matrix:
    2 bits per base (A/a C/c G/g T/t -> 0..3) plus a flat-position
    exception list for every in-length byte that is not uppercase ACGT
    (N runs, soft-masking, '$', ...). Returns None when L % 4 != 0 or
    the exceptions exceed L//16 (soft-masked genomes: the packed form
    would not pay for itself) -- the caller falls back to the raw
    upload. The hot loop runs in native code when the library is built
    (csrc/pack.cpp, ~8x the numpy formulation below, which stays as the
    fallback and differential reference; KBO_TPU_NATIVE_PACK=0 forces
    numpy)."""
    import os

    import numpy as np

    Q, L = ref_mat.shape
    if L % 4:
        return None
    if os.environ.get("KBO_TPU_NATIVE_PACK", "1") != "0":
        from kbo_tpu import native

        out = native.pack_ascii(ref_mat, lengths)
        if out is not None:
            return out
    # one fused LUT pass: low 2 bits = base code, bit 7 = "not uppercase
    # ACGT" (a byte that must ride the exception list if in-length)
    lut = np.full(256, 0x80, dtype=np.uint8)
    for c2, chars in enumerate((b"Aa", b"Cc", b"Gg", b"Tt")):
        for ch in chars:
            lut[ch] = c2 | (0x80 if ch >= ord("a") else 0)
    lc = np.ascontiguousarray(lut[ref_mat])
    # word-parallel pack: a little-endian uint32 view holds 4 base codes
    # in its bytes; OR-ing the word with itself shifted by 6/12/18 lands
    # code i at bits 2i..2i+1 with no cross-terms (codes < 4 after the
    # flag mask), so the byte mask IS the packed nibble-pair -- one pass
    # instead of four strided slice reads. The in-length mask is NOT
    # materialized (an int64 broadcast compare measured 48 ms at 4.6M):
    # bad positions are filtered against row lengths after the (cheap)
    # flatnonzero, since tails and exceptions are both sparse
    v = lc.reshape(Q, L // 4, 4).view(np.uint32)[..., 0] & np.uint32(
        0x03030303
    )  # drop the flag bits before packing
    packed4 = ((v | (v >> 6) | (v >> 12) | (v >> 18)) & 0xFF).astype(
        np.uint8
    )
    bad_pos = np.flatnonzero(lc & 0x80)
    if bad_pos.size:
        lens = np.asarray(lengths)[:Q].astype(np.int64)
        q = bad_pos // L
        exc_pos = bad_pos[(bad_pos - q * L) < lens[q]]
    else:
        exc_pos = bad_pos
    if exc_pos.size > max(64, Q * L // 16):
        return None
    cap_e = 64
    while cap_e < exc_pos.size:
        cap_e <<= 1
    pos_pad = np.full(cap_e, Q * L, dtype=np.int32)
    byte_pad = np.zeros(cap_e, dtype=np.uint8)
    pos_pad[: exc_pos.size] = exc_pos
    byte_pad[: exc_pos.size] = ref_mat.reshape(-1)[exc_pos]
    return packed4, pos_pad, byte_pad


@jax.jit
def decode_packed4_device(packed4, exc_pos, exc_byte, lengths):
    """Device side of the packed reference upload: exact raw ASCII [Q, L]
    from 2-bit packed bases + the exception list (see pack_ascii_host).
    Padding beyond each row's length decodes to 0, matching the host
    matrix layout byte for byte."""
    Q, Lp = packed4.shape
    L = Lp * 4
    parts = [
        ((packed4 >> jnp.uint8(2 * j)) & jnp.uint8(3)) for j in range(4)
    ]
    u2 = jnp.stack(parts, axis=-1).reshape(Q, L)
    out = jnp.uint8(ord("A")) + jnp.zeros((Q, L), jnp.uint8)
    for c2, ch in enumerate(b"CGT"):
        out = jnp.where(u2 == jnp.uint8(c2 + 1), jnp.uint8(ch), out)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    out = jnp.where(idx < lengths[:, None], out, jnp.uint8(0))
    flat = out.reshape(-1).at[exc_pos].set(exc_byte, mode="drop")
    return flat.reshape(Q, L)


@jax.jit
def decode_packed4_encode_device(packed4, exc_pos, exc_byte, lengths):
    """One dispatch for the packed-upload tail: exact raw ASCII [Q, L]
    AND its sweep codes together (decode_packed4_device +
    encode_ascii_device fused -- the raw matrix never round-trips HBM
    between two separate launches)."""
    rm = decode_packed4_device(packed4, exc_pos, exc_byte, lengths)
    return rm, encode_ascii_device(rm)


@jax.jit
def encode_ascii_device(ascii_mat):
    """Device twin of index.encode.encode_ascii: raw ASCII bytes -> codes
    (0='$', 1..4=ACGT/acgt, else INVALID), as branch-free selects.

    Lets the map path upload the reference ONCE (the raw bytes, which the
    refinement and delta assembly need anyway) and derive the sweep codes
    on device instead of shipping a second same-sized array through the
    relay. Zero padding encodes to INVALID, matching pipeline.pad_batch.
    """
    lower = ascii_mat | jnp.uint8(0x20)
    code = jnp.full(ascii_mat.shape, INVALID, dtype=jnp.uint8)
    code = jnp.where(ascii_mat == jnp.uint8(ord("$")), jnp.uint8(0), code)
    for b, ch in enumerate(b"acgt"):
        code = jnp.where(lower == jnp.uint8(ch), jnp.uint8(b + 1), code)
    return code


def _compact_row(mask, idx):
    """Ascending positions where mask is set, padded with BIG (full length).

    Sort-based compaction: where(mask, idx, BIG) sorted ascending. The
    caller slices the first `cap` columns after the count is known.
    """
    vals = jnp.where(mask, idx, _BIG32)
    return jax.lax.sort(vals, is_stable=False)


def _compact_mask_capped(mask, idx, cap: int):
    """First `cap` set positions of ``mask`` in ascending order, padded
    with BIG: one cumsum + ``cap`` binary searches (slot j holds the
    position of the (j+1)-th set bit = the first index whose inclusive
    cumsum reaches j+1). Candidates are sparse (~1/kb) while the mask is
    genome-wide, so cap * log2(L) gather steps beat anything that
    touches all L slots: the full-width rank SCATTER this replaces
    measured 26 ms vs 7.5 ms at 4.6M/cap=8k on TPU v5e, and the
    [Q*L]-wide ``lax.sort`` compaction before it was worse still
    (gather/scatter volume is what the hardware pays for, BASELINE.md).
    ``KBO_TPU_COMPACT=scatter`` restores the scatter for measurement."""
    import os

    m32 = mask.astype(jnp.int32)
    if os.environ.get("KBO_TPU_COMPACT", "search") == "scatter":
        rank = jnp.cumsum(m32) - m32
        tgt = jnp.where(mask, rank, jnp.int32(cap))
        out = jnp.full(cap, _BIG32, jnp.int32)
        return out.at[tgt].set(idx.astype(jnp.int32), mode="drop")
    cs = jnp.cumsum(m32)
    j = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.searchsorted(cs, j + 1, side="left").astype(jnp.int32)
    valid = j < cs[-1]
    safe = jnp.minimum(pos, jnp.int32(idx.shape[0] - 1))
    return jnp.where(valid, idx[safe].astype(jnp.int32), _BIG32)


def _next_nondash(is_dash, idx, length):
    """nnd[i] = smallest j > i with NOT is_dash[j], clamped to `length`.

    Log-depth reverse doubling min-scan (positions >= length count as
    non-dash, so runs always terminate at the true length).
    """
    L = idx.shape[0]
    x = jnp.where(is_dash, _BIG32, idx)
    # exclusive-from-right scan: shift by one, then doubling cummin
    x = jnp.concatenate([x[1:], jnp.full((1,), _BIG32, jnp.int32)])
    s = 1
    while s < L:
        shifted = jnp.concatenate(
            [x[s:], jnp.full((s,), _BIG32, jnp.int32)]
        )
        x = jnp.minimum(x, shifted)
        s <<= 1
    return jnp.minimum(x, length)


def map_sweep_compact_core(keys2, cap2, codes, lengths, k: int, threshold):
    """Fused map sweep with on-device candidate compaction.

    codes: uint8 [Q, L] tail-padded with INVALID; lengths: int32 [Q].

    Returns (chars [Q, L] uint8, ms [Q, L] int32, counts [Q, 2] int32
    (= n_drops, n_gaps), drop_pos [Q, L] int32 sorted-compacted,
    gap_start [Q, L] int32 sorted-compacted, gap_end_at [Q, L] int32).
    ``gap_end_at[q, j]`` is the run end for the run starting at
    ``gap_start[q, j]`` (aligned with the compacted starts). The dense
    outputs are meant to STAY on device; callers fetch only count-sized
    slices of the compacted arrays.
    """
    Q, L = codes.shape
    pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
    buf = jnp.concatenate([pad, codes], axis=1).reshape(-1)
    stride = L + k - 1
    ms = ms2_core(keys2, cap2, buf, k).reshape(Q, stride)[:, k - 1 :]
    derand = jax.vmap(lambda m, n: derandomize_core(m, k, threshold, n))(
        ms, lengths
    )
    chars = jax.vmap(lambda d, n: translate_core(d, k, threshold, n))(
        derand, lengths
    )

    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_len = idx < lengths[:, None]
    t = jnp.int32(threshold)

    # MS drops (reference: src/variant_calling.rs:268-269): i >= 1 with
    # ms[i] < ms[i-1], ms[i-1] >= t, ms[i] < t. The variant caller's
    # threshold equals the sweep threshold (same index, same error prob).
    prev_ms = jnp.concatenate([ms[:, :1], ms[:, :-1]], axis=1)
    drop_mask = (
        (idx >= 1) & in_len & (ms < prev_ms) & (prev_ms >= t) & (ms < t)
    )
    drop_pos = jax.vmap(lambda m: _compact_row(m, idx[0]))(drop_mask)

    # gap runs (reference: src/gap_filling.rs:466-475): maximal
    # ['-'|'X'] + '-'* blocks with start in [t, n - t - 1). An 'X' always
    # starts a run (a run's dash-continuation stops at any non-dash); a
    # dash p0 > lo starts one iff it is not covered by the continuation of
    # the run through p0-1 -- and any in-range gap char at p0-1 (dash or
    # 'X') is in a run whose continuation extends through dash p0
    # (see refine/gap_filling._gap_runs for the host formulation).
    is_dash = (chars == _DASH) & in_len
    is_x = (chars == _X) & in_len
    is_gapc = is_dash | is_x
    lo = t
    hi = lengths[:, None] - t - 1
    prev_gapc = jnp.concatenate(
        [jnp.zeros((Q, 1), bool), is_gapc[:, :-1]], axis=1
    )
    start_mask = (
        is_gapc & (idx >= lo) & (idx < hi) & (is_x | (idx == lo) | ~prev_gapc)
    )
    gap_start = jax.vmap(lambda m: _compact_row(m, idx[0]))(start_mask)
    nnd = jax.vmap(_next_nondash)(is_dash, idx + jnp.zeros((Q, 1), jnp.int32), lengths)
    # run end aligned with each compacted start (clip the BIG padding)
    gap_end_at = jnp.take_along_axis(
        nnd, jnp.minimum(gap_start, jnp.int32(L - 1)), axis=1
    )

    # counts stacked into one [Q, 2] array: fetching them is ONE round trip
    counts = jnp.stack(
        [
            jnp.sum(drop_mask, axis=1, dtype=jnp.int32),
            jnp.sum(start_mask, axis=1, dtype=jnp.int32),
        ],
        axis=1,
    )
    return chars, ms, counts, drop_pos, gap_start, gap_end_at


map_sweep_compact = jax.jit(map_sweep_compact_core, static_argnames=("k",))


@functools.partial(jax.jit, static_argnames=("cap_d", "cap_g"))
def fetch_candidates(
    counts, drop_pos, gap_start, gap_end_at, cap_d: int, cap_g: int
):
    """Slice the compacted candidate arrays to bucketed capacities and pack
    them WITH the counts into one int32 matrix (one fetch = one relay round
    trip; the caller checks the leading counts for capacity overflow and
    refetches with exact capacities in the rare dense case). Arrays shorter
    than a capacity (references shorter than the slot floor) pad with BIG
    so the caller's fixed-offset parse stays aligned."""

    def cols(arr, cap):
        out = arr[:, :cap]
        if out.shape[1] < cap:
            out = jnp.pad(
                out, ((0, 0), (0, cap - out.shape[1])),
                constant_values=_BIG32,
            )
        return out

    return jnp.concatenate(
        [
            counts,
            cols(drop_pos, cap_d),
            cols(gap_start, cap_g),
            cols(gap_end_at, cap_g),
        ],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("k", "want_qtable"))
def ms3_rows_sweep(keys3, lcs3, codes, k: int, want_qtable: bool = False,
                  a_streams=None):
    """Stage 1 of the fused map sweep: the 3-bit join over a [Q, L] batch,
    emitting device-resident per-position (ms, uniq, row). Split from the
    postprocess stage (:func:`map_postprocess3`) because XLA:TPU compile
    time is superlinear in program size -- the two halves compile in a
    fraction of the fused whole and the extra dispatch costs no fetch
    (async dispatch; stage 2 consumes stage 1's device arrays).

    ``want_qtable`` additionally returns ``[(words, limits)]``: the
    sweep-sorted query window keys (kernels.ms.ms3_rows_core), reusable
    as the rk-vs-seq join table for single-contig batches."""
    from kbo_tpu.kernels.ms import ms3_rows_core

    Q, L = codes.shape
    pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
    buf = jnp.concatenate([pad, codes], axis=1).reshape(-1)
    stride = L + k - 1
    out = ms3_rows_core(keys3, lcs3, buf, k, want_qtable, a_streams)
    ms_f, uniq_f, row_f = out[:3]
    ms = ms_f.reshape(Q, stride)[:, k - 1 :]
    uniq = uniq_f.reshape(Q, stride)[:, k - 1 :]
    rows = row_f.reshape(Q, stride)[:, k - 1 :]
    if want_qtable:
        return ms, uniq, rows, [out[3]]
    return ms, uniq, rows


def ms3_rows_sweep_chunked(keys3, lcs3, codes, k: int, chunk: int,
                           want_qtable: bool = False, a_streams=None):
    """Sequence-chunked stage 1: the same (ms, uniq, row) outputs from
    fixed-shape sub-dispatches of ``chunk`` positions each.

    Window position p depends only on codes[p-k+1 .. p], so feeding each
    chunk the previous chunk's last k-1 codes as context makes the split
    EXACT (SURVEY 5 long-context plan). Every chunk reuses ONE compiled
    program (identical shapes; the first chunk's context is INVALID pad,
    exactly the unchunked buffer head), which caps XLA:TPU compile time
    at the chunk size instead of the genome size and keeps the packed
    join under its 2^24-slot budget for arbitrarily long references.
    Runtime trades table-side merge traffic: each sub-dispatch re-scans
    the n-row key table, so chunks should stay as large as the slot
    budget allows.

    ``want_qtable`` additionally returns the per-chunk sorted query-key
    tables ``[(words, limits), ...]`` (kernels.ms.ms3_rows_core): every
    true window of the sequence appears with full k-1 context in exactly
    one chunk's buffer, and a context-region duplicate can only carry a
    truncated (<=) key/limit, so a max over per-chunk joins against
    these tables is exact -- the same argument as the sequence-sharded
    rk-vs-seq join (kernels.refine.resolve_variants_core ``seq_axis``).
    """
    Q, L = codes.shape
    n_chunks = (L + chunk - 1) // chunk
    Lp = n_chunks * chunk
    if Lp != L:
        codes = jnp.pad(
            codes, ((0, 0), (0, Lp - L)), constant_values=INVALID
        )
    parts = []
    for c in range(n_chunks):
        lo = c * chunk
        if c == 0:
            ctx = jnp.full((Q, k - 1), INVALID, jnp.uint8)
        else:
            ctx = codes[:, lo - (k - 1) : lo]
        parts.append(
            _ms3_rows_chunk(
                keys3, lcs3,
                jnp.concatenate([ctx, codes[:, lo : lo + chunk]], axis=1),
                k, want_qtable, a_streams,
            )
        )
    ms = jnp.concatenate([p[0] for p in parts], axis=1)[:, :L]
    uniq = jnp.concatenate([p[1] for p in parts], axis=1)[:, :L]
    rows = jnp.concatenate([p[2] for p in parts], axis=1)[:, :L]
    if want_qtable:
        return ms, uniq, rows, [p[3] for p in parts]
    return ms, uniq, rows


def upload_sweep_chunked_pipelined(keys3, lcs3, ref_mat, lengths, k: int,
                                   chunk: int, want_qtable: bool = False,
                                   a_streams=None):
    """Chunked stage 1 with the UPLOAD chunked too: pack + ship chunk c+1
    while the device sweeps chunk c.

    The map upload (packed reference -> decode+encode) and the sweep are
    serial in the one-shot formulation: ~0.04 s of host pack + host->device
    transfer sit in front of the first sweep dispatch at 4.6M through the
    relay. Splitting both along the SAME chunk grid pipelines them: each
    chunk's decode/sweep dispatches are async, so the host immediately
    packs and ships the next chunk while the device works. Per-chunk
    geometry is exact: in-chunk lengths clip the row lengths into the
    slice, beyond-length positions decode to 0 -> INVALID codes, matching
    the unchunked arrays byte-for-byte; sweep context is the previous
    chunk's device-resident last k-1 codes.

    Returns (ref_mat_dev [Q, L], codes_dev [Q, L], ms, uniq, rows,
    qtables-or-None) or None when the packed upload does not apply
    (caller falls back to the one-shot upload)."""
    Q, L = ref_mat.shape
    if L % 4 or chunk % 4:
        return None
    n_chunks = (L + chunk - 1) // chunk
    lens = np.asarray(lengths)
    ref_parts, code_parts, sweeps = [], [], []
    for c in range(n_chunks):
        lo = c * chunk
        hi = min(lo + chunk, L)
        sl = ref_mat[:, lo:hi]
        if hi - lo < chunk:
            sl = np.pad(sl, ((0, 0), (0, chunk - (hi - lo))))
        sl = np.ascontiguousarray(sl)
        in_chunk_lens = np.clip(lens - lo, 0, chunk).astype(lens.dtype)
        packed_up = pack_ascii_host(sl, in_chunk_lens)
        if packed_up is None:
            return None  # dense exceptions: one-shot raw upload instead
        r_dev, c_dev = decode_packed4_encode_device(
            jnp.asarray(packed_up[0]), jnp.asarray(packed_up[1]),
            jnp.asarray(packed_up[2]), jnp.asarray(in_chunk_lens),
        )
        if c == 0:
            ctx = jnp.full((Q, k - 1), INVALID, jnp.uint8)
        else:
            ctx = code_parts[-1][:, -(k - 1):]
        ref_parts.append(r_dev)
        code_parts.append(c_dev)
        sweeps.append(
            _ms3_rows_chunk(
                keys3, lcs3, jnp.concatenate([ctx, c_dev], axis=1), k,
                want_qtable, a_streams,
            )
        )
    ref_mat_dev = jnp.concatenate(ref_parts, axis=1)[:, :L]
    codes_dev = jnp.concatenate(code_parts, axis=1)[:, :L]
    ms = jnp.concatenate([p[0] for p in sweeps], axis=1)[:, :L]
    uniq = jnp.concatenate([p[1] for p in sweeps], axis=1)[:, :L]
    rows = jnp.concatenate([p[2] for p in sweeps], axis=1)[:, :L]
    qtables = [p[3] for p in sweeps] if want_qtable else None
    return ref_mat_dev, codes_dev, ms, uniq, rows, qtables


@functools.partial(jax.jit, static_argnames=("k", "want_qtable"))
def _ms3_rows_chunk(keys3, lcs3, ctx_codes, k: int,
                    want_qtable: bool = False, a_streams=None):
    """One fixed-shape chunk of :func:`ms3_rows_sweep_chunked`:
    ctx_codes = [Q, (k-1) + chunk] (context + chunk positions); returns
    (ms, uniq, rows) for the chunk positions only (the qtable, when
    requested, covers ALL buffer positions -- context windows stay)."""
    from kbo_tpu.kernels.ms import ms3_rows_core

    Q, W = ctx_codes.shape
    buf = ctx_codes.reshape(-1)
    out = ms3_rows_core(keys3, lcs3, buf, k, want_qtable, a_streams)
    ms_f, uniq_f, row_f = out[:3]
    ms = ms_f.reshape(Q, W)[:, k - 1 :]
    uniq = uniq_f.reshape(Q, W)[:, k - 1 :]
    rows = row_f.reshape(Q, W)[:, k - 1 :]
    if want_qtable:
        return ms, uniq, rows, out[3]
    return ms, uniq, rows


def map_postprocess3_core(ms, uniq, rows, lengths, k: int, threshold,
                          cap_d: int, cap_g: int, w_grid: int | None = None):
    """Stage 2 of the fused map sweep: derandomize/translate, candidate
    compaction, device-side variant anchors and gap unique-context grids
    from the dense stage-1 outputs -- one packed int32 fetch carries
    everything the host refinement needs.

    Together the two stages replace the (2-bit sweep join) + (floor/ceil
    interval probe pass) pair: the 3-bit all-rows join yields the same MS
    values (the 3-bit keyspace expresses '$' boundaries directly) while
    uniqueness and the matched colex row fall out of the LCS identity
    (kernels.ms.ms3_rows_core), so the refinement probe pass disappears.

    Returns (chars uint8 [Q, L] -- device-resident;
    packed int32 [Q, 2 + cap_d + 2*cap_g + 2*cap_d + cap_g*w_grid]):
    per row: n_drops, n_gaps, drop positions, gap starts, gap ends,
    anchor positions (-1 = none; reference anchor rule,
    src/variant_calling.rs:271-272), anchor colex rows, then the gap
    unique-context grid (colex row at search_lo_g + c when unique, else
    -1; src/gap_filling.rs:127-151, :466-478).

    ``w_grid`` (static) is the candidate-window width: the reference's
    search window is [end+t, min(end+radius, n-1)] with radius <= k, so
    its width never exceeds k - threshold + 1; callers that know the
    integer threshold pass that (the k+1 default is the thresholdless
    upper bound). Positions beyond the true window are -1 either way.
    """
    Q, L = ms.shape
    assert k < 128, "packed probe word carries ms in 7 bits"
    if w_grid is None:
        w_grid = k + 1
    derand = jax.vmap(lambda m, n: derandomize_core(m, k, threshold, n))(
        ms, lengths
    )
    chars = jax.vmap(lambda d, n: translate_core(d, k, threshold, n))(
        derand, lengths
    )

    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_len = idx < lengths[:, None]
    t = jnp.int32(threshold)

    prev_ms = jnp.concatenate([ms[:, :1], ms[:, :-1]], axis=1)
    drop_mask = (
        (idx >= 1) & in_len & (ms < prev_ms) & (prev_ms >= t) & (ms < t)
    )
    drop_pos = jax.vmap(
        lambda m: _compact_mask_capped(m, idx[0], cap_d)
    )(drop_mask)

    is_dash = (chars == _DASH) & in_len
    is_x = (chars == _X) & in_len
    is_gapc = is_dash | is_x
    lo_t = t
    hi_t = lengths[:, None] - t - 1
    prev_gapc = jnp.concatenate(
        [jnp.zeros((Q, 1), bool), is_gapc[:, :-1]], axis=1
    )
    start_mask = (
        is_gapc
        & (idx >= lo_t)
        & (idx < hi_t)
        & (is_x | (idx == lo_t) | ~prev_gapc)
    )
    gap_start = jax.vmap(
        lambda m: _compact_mask_capped(m, idx[0], cap_g)
    )(start_mask)
    nnd = jax.vmap(_next_nondash)(
        is_dash, idx + jnp.zeros((Q, 1), jnp.int32), lengths
    )
    gap_end_at = jnp.take_along_axis(
        nnd, jnp.minimum(gap_start, jnp.int32(L - 1)), axis=1
    )

    counts = jnp.stack(
        [
            jnp.sum(drop_mask, axis=1, dtype=jnp.int32),
            jnp.sum(start_mask, axis=1, dtype=jnp.int32),
        ],
        axis=1,
    )
    # per-contig clamped gap bases over ALL runs (incl. any beyond the
    # slot capacities): sum of max(0, min(run_end, n - t) - start) --
    # feeds the unfilled-bases stat when gap filling is off or fell back
    clamped_gap = jnp.sum(
        jnp.where(
            start_mask,
            jnp.maximum(
                jnp.minimum(nnd, lengths[:, None] - t) - idx, 0
            ),
            0,
        ),
        axis=1,
        dtype=jnp.int32,
    )

    # one packed word per position -- (row 24b | ms 7b | uniq 1b), k < 64
    # guaranteed upstream -- so the anchor and grid probes below pay ONE
    # gather per position instead of three
    packed_pos = (
        (jnp.clip(rows, 0, None).astype(jnp.uint32) << 8)
        | (jnp.clip(ms, 0, 127).astype(jnp.uint32) << 1)
        | uniq.astype(jnp.uint32)
    )

    def refine_one(pk_q, dp_row, gs_row, ge_row, n_q):
        # variant anchors: first j in (i, i+k] with ms[j] >= t and a
        # unique interval -- now pure gathers from the dense join outputs
        dp = _pad_slots(dp_row, cap_d)
        real_d = dp < _BIG32
        offs_a = jnp.arange(1, k + 1, dtype=jnp.int32)
        pos_a = jnp.minimum(dp[:, None], jnp.int32(2**30)) + offs_a[None, :]
        valid_a = real_d[:, None] & (pos_a < n_q)
        pa = jnp.clip(pos_a, 0, L - 1)
        at = pk_q[pa]
        ok = (
            (((at >> 1) & jnp.uint32(0x7F)).astype(jnp.int32) >= t)
            & (at & 1).astype(bool)
            & valid_a
        )
        has = ok.any(axis=1)
        first = jnp.argmax(ok, axis=1)
        apos = jnp.where(
            has, jnp.take_along_axis(pos_a, first[:, None], 1)[:, 0], -1
        )
        arow = jnp.where(
            has,
            jnp.take_along_axis(
                (at >> 8).astype(jnp.int32), first[:, None], 1
            )[:, 0],
            -1,
        )

        # gap unique-context grid over each run's search window
        gstart = _pad_slots(gs_row, cap_g)
        gend = _pad_slots(ge_row, cap_g)
        gs = jnp.minimum(gstart, jnp.int32(2**30))
        real_g = gstart < _BIG32
        end = jnp.minimum(gend, n_q - t)
        gap_len = end - gs
        fits = gap_len + 2 * t <= jnp.int32(k)
        radius = jnp.int32(k) - jnp.where(fits, t, 0)
        lo = end + t
        hi = jnp.minimum(end + radius, n_q - 1)
        offs_g = jnp.arange(w_grid, dtype=jnp.int32)
        pos_g = lo[:, None] + offs_g[None, :]
        valid_g = real_g[:, None] & (pos_g <= hi[:, None]) & (pos_g >= 0)
        pg = jnp.clip(pos_g, 0, L - 1)
        gt = pk_q[pg]
        grid = jnp.where(
            valid_g & (gt & 1).astype(bool), (gt >> 8).astype(jnp.int32), -1
        )
        return apos.astype(jnp.int32), arow.astype(jnp.int32), grid

    apos, arow, grid = jax.vmap(refine_one)(
        packed_pos, drop_pos, gap_start, gap_end_at, lengths
    )

    def cols(arr, cap):
        out = arr[:, :cap]
        if out.shape[1] < cap:  # tiny inputs: fewer slots than the capacity
            out = jnp.pad(
                out, ((0, 0), (0, cap - out.shape[1])),
                constant_values=_BIG32,
            )
        return out

    packed = jnp.concatenate(
        [
            counts,
            cols(drop_pos, cap_d),
            cols(gap_start, cap_g),
            cols(gap_end_at, cap_g),
            apos,
            arow,
            grid.reshape(Q, cap_g * w_grid),
        ],
        axis=1,
    )
    # the same candidate tables as separate DEVICE arrays: the on-device
    # refinement kernels (kernels/refine.py) consume these without the
    # packed fetch ever reaching the host
    pieces = {
        "drop_pos": cols(drop_pos, cap_d),
        "gap_start": cols(gap_start, cap_g),
        "gap_end_at": cols(gap_end_at, cap_g),
        "apos": apos,
        "arow": arow,
        "grid": grid,
        "counts": counts,
        "clamped_gap": clamped_gap,
    }
    return chars, packed, pieces


map_postprocess3 = jax.jit(
    map_postprocess3_core, static_argnames=("k", "cap_d", "cap_g", "w_grid")
)


def _pad_slots(arr, cap: int):
    """Slice a sort-compacted slot array to `cap`, padding with BIG when
    the source is shorter (tiny inputs)."""
    out = arr[:cap]
    if out.shape[0] < cap:
        out = jnp.pad(out, (0, cap - out.shape[0]), constant_values=_BIG32)
    return out


def assemble_map_core(chars, ref_ascii, lengths, patch_pos, patch_val,
                      fmt: bool):
    """Patch the device-resident translation and emit output deltas as
    constant-value runs.

    chars: uint8 [Q, L] from the sweep; ref_ascii: uint8 [Q, L] raw
    reference bytes (tail padding arbitrary); patch_pos: int32 [P] global
    flat positions (q * L + i, out-of-range = inert); patch_val: uint8 [P].

    With ``fmt`` the output is ``relative_to_ref`` (reference:
    src/format.rs:266-287) and deltas are vs the reference bytes; without,
    the output is the patched translation and deltas are vs 'M'. Deltas are
    run-length encoded (maximal runs of one differing value), so both the
    common shapes -- isolated SNP edits and long uncovered '-' stretches --
    fetch in O(#runs), never O(n). Returns (counts int32 [2] =
    (n_runs, checksum), run_start int32 [Q*L] sorted-compacted global flat,
    run_end int32 [Q*L] aligned, run_val uint8 [Q*L] aligned); the dense
    arrays stay on device for a count-sized slice fetch.
    """
    Q, L = chars.shape
    flat = chars.reshape(-1)
    flat = flat.at[patch_pos].set(patch_val, mode="drop")
    return _emit_deltas(flat, ref_ascii, lengths, fmt)


def _emit_deltas(flat, ref_ascii, lengths, fmt: bool, cap: int | None = None):
    """Shared tail of the assemble kernels: relative_to_ref + delta runs.

    With ``cap`` the run arrays come back ``cap`` wide via the scatter
    compaction (no full-length sort and no full-length end/value
    gathers); the true run count still rides ``counts`` so an
    undersized cap is detected and the caller re-assembles."""
    Q, L = ref_ascii.shape
    ref_flat = ref_ascii.reshape(-1)
    if fmt:
        take_ref = (flat == _M) | (flat == ord("R")) | (flat == ord("I"))
        dash = (flat == _X) | (flat == ord("D")) | (flat == _DASH)
        out = jnp.where(
            take_ref, ref_flat, jnp.where(dash, jnp.uint8(_DASH), flat)
        )
        base = ref_flat
    else:
        out = flat
        base = jnp.full_like(flat, jnp.uint8(_M))

    idx = jnp.arange(Q * L, dtype=jnp.int32)
    in_len = (idx % L) < jnp.repeat(lengths, L)
    mask = in_len & (out != base)
    # a run continues while the delta value repeats (and never crosses a
    # contig row boundary, which (idx % L) == 0 breaks naturally only at
    # in_len edges -- guard it explicitly)
    prev_mask = jnp.concatenate([jnp.zeros((1,), bool), mask[:-1]])
    prev_out = jnp.concatenate([out[:1], out[:-1]])
    cont = (
        mask & prev_mask & (out == prev_out) & (idx % L != 0)
    )
    run_start_mask = mask & ~cont
    if cap is None:
        run_start = _compact_row(run_start_mask, idx)
    else:
        run_start = _compact_mask_capped(run_start_mask, idx, cap)
    ncont = _next_nondash(cont, idx, jnp.int32(Q * L))
    at = jnp.minimum(run_start, jnp.int32(Q * L - 1))
    run_end = ncont[at]
    run_val = out[at]
    n_runs = jnp.sum(run_start_mask, dtype=jnp.int32)
    checksum = jnp.sum(
        jnp.where(in_len, out, 0).astype(jnp.int32), dtype=jnp.int32
    )
    counts = jnp.stack([n_runs, checksum])
    return counts, run_start, run_end, run_val


assemble_map = jax.jit(assemble_map_core, static_argnames=("fmt",))


def assemble_map_prio_core(
    chars, ref_ascii, lengths, pos_grids, prio_val_grids, fmt: bool,
    cap: int | None = None,
):
    """Priority-ordered patch application + delta emission.

    ``pos_grids`` / ``prio_val_grids``: parallel lists of int32 arrays
    (any shape; flattened) where positions are global flat q*L+i
    (out-of-range = inert) and values pack (priority << 8) | ascii.
    Duplicate positions resolve by scatter-max on the packed value, so
    priorities reproduce the host's dict ordering deterministically
    (XLA scatter with duplicate indices is otherwise unordered): gap
    fills carry priority 1, variant patches 2 + site order, host extras
    ride above (kernels/refine.py docstring).
    """
    Q, L = chars.shape
    acc = jnp.zeros(Q * L, dtype=jnp.int32)
    for pos, pv in zip(pos_grids, prio_val_grids):
        acc = acc.at[pos.reshape(-1).astype(jnp.int32)].max(
            pv.reshape(-1).astype(jnp.int32), mode="drop"
        )
    flat = jnp.where(
        acc > 0, (acc & 0xFF).astype(jnp.uint8), chars.reshape(-1)
    )
    return _emit_deltas(flat, ref_ascii, lengths, fmt, cap)


assemble_map_prio = jax.jit(
    assemble_map_prio_core, static_argnames=("fmt", "cap")
)


@functools.partial(jax.jit, static_argnames=("cap",))
def fetch_delta_runs_extras(counts, run_start, run_end, run_val, extras,
                            cap: int):
    """:func:`fetch_delta_runs` with extra int32 scalars appended after the
    counts in row 3 -- refinement counters, overflow indicators and host-
    fallback flags ride the SAME single fetch as the output deltas."""
    n_extra = extras.shape[0]
    crow = (
        jnp.zeros(cap, jnp.int32)
        .at[:2]
        .set(counts.astype(jnp.int32))
        .at[2 : 2 + n_extra]
        .set(extras.astype(jnp.int32))
    )

    def fit(row):
        row = row[:cap].astype(jnp.int32)
        if row.shape[0] < cap:
            row = jnp.pad(row, (0, cap - row.shape[0]))
        return row

    return jnp.stack([fit(run_start), fit(run_end), fit(run_val), crow])


@functools.partial(jax.jit, static_argnames=("cap",))
def fetch_delta_runs(counts, run_start, run_end, run_val, cap: int):
    """Slice the compacted delta runs to a bucketed capacity, packed with
    the (n_runs, checksum) counts as one int32 [4, cap] fetch (row 3 holds
    the counts in its leading entries)."""
    crow = jnp.zeros(cap, jnp.int32).at[:2].set(counts)

    def fit(row):
        row = row[:cap].astype(jnp.int32)
        if row.shape[0] < cap:  # tiny inputs: fewer runs than the capacity
            row = jnp.pad(row, (0, cap - row.shape[0]))
        return row

    return jnp.stack([fit(run_start), fit(run_end), fit(run_val), crow])
