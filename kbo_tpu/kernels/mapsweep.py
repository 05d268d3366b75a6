"""Sparse-fetch map pipeline kernels: device-side candidate compaction and
delta-encoded output assembly.

The map path (reference: src/lib.rs:720-761) interleaves a dense sweep with
data-dependent refinement. Device->host transfers through a TPU host (and
especially through this environment's relay) are the end-to-end bottleneck,
so the round-2 execution model never fetches a full-length array:

1. :func:`map_sweep_compact_core` runs MS + derandomize + translate fused
   (one device call) and *compacts on device* the two candidate sets the
   refinement layers need -- MS drop sites (variant calling, reference:
   src/variant_calling.rs:268-269) and gap runs of the translation
   (gap filling, reference: src/gap_filling.rs:466-475). Only the counts
   and the compacted index lists are fetched; the dense ``chars``/``ms``
   arrays stay resident on device.
2. The refinement layers work from the compacted candidates with sparse
   interval probes and batched k-mer joins, producing a small list of
   (position, char) patches on host.
3. :func:`assemble_map_core` scatters the patches into the device-resident
   translation, applies ``relative_to_ref`` (reference: src/format.rs:266-287)
   on device, and emits the output as *deltas against the reference* (map
   output is ~99.9% equal to the reference sequence); the host reconstructs
   the full bytes from ref + deltas.

Compaction is sort-based (positions of mask -> stable ascending order),
which is TPU-friendly: one single-key ``lax.sort`` instead of a serialized
gather/scatter. All shapes are static; capacities are bucketed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kbo_tpu.kernels.ms import INVALID, ms2_core
from kbo_tpu.kernels.postprocess import derandomize_core, translate_core

_BIG32 = jnp.int32(2**31 - 1)
_M, _X, _DASH = ord("M"), ord("X"), ord("-")


def _compact_row(mask, idx):
    """Ascending positions where mask is set, padded with BIG (full length).

    Sort-based compaction: where(mask, idx, BIG) sorted ascending. The
    caller slices the first `cap` columns after the count is known.
    """
    vals = jnp.where(mask, idx, _BIG32)
    return jax.lax.sort(vals, is_stable=False)


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
    refetches with exact capacities in the rare dense case)."""
    return jnp.concatenate(
        [
            counts,
            drop_pos[:, :cap_d],
            gap_start[:, :cap_g],
            gap_end_at[:, :cap_g],
        ],
        axis=1,
    )


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
    run_start = _compact_row(run_start_mask, idx)
    ncont = _next_nondash(cont, idx, jnp.int32(Q * L))
    run_end = jnp.take_along_axis(
        ncont[None, :],
        jnp.minimum(run_start, jnp.int32(Q * L - 1))[None, :],
        axis=1,
    )[0]
    run_val = out[jnp.minimum(run_start, jnp.int32(Q * L - 1))]
    n_runs = jnp.sum(run_start_mask, dtype=jnp.int32)
    checksum = jnp.sum(
        jnp.where(in_len, out, 0).astype(jnp.int32), dtype=jnp.int32
    )
    counts = jnp.stack([n_runs, checksum])
    return counts, run_start, run_end, run_val


assemble_map = jax.jit(assemble_map_core, static_argnames=("fmt",))


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
