"""Pallas TPU bitonic merge for the sort-join engine.

The join always combines a FRESH query-side array with the REFERENCE key
array that was sorted once at build time. ``lax.sort`` of the
concatenation is a full ~log^2 N bitonic network; merging two sorted
sequences only needs the log2(N) half-cleaner cascade. This module
implements that cascade in Pallas:

- the bitonic input is ``A ++ pads(+inf) ++ reverse(B)`` (ascending, peak,
  descending) padded to a power of two;
- stages with distance >= BLOCK are one ``pallas_call`` each over a
  [G, 2, S, R, 128] view: every program loads the two partner slabs
  (rectangular BlockSpec) and compare-exchanges them elementwise -- no
  interleaving, no relayout;
- all stages with distance < BLOCK run in ONE ``pallas_call`` per block in
  VMEM: for distance >= 128 the partner sits a whole sublane-row away, for
  distance < 128 within the lane dimension, so every exchange is an
  axis-aligned ``pltpu.roll`` + select (a pair's two elements never cross
  a row boundary because the pairing distance is a power of two).

Comparisons are lexicographic over the first ``n_comps`` operand arrays
(uint32/int32); remaining operands ride along as payloads. Tie semantics
(e.g. "reference rows sort before equal query probes") must be encoded as
an explicit rank comparison component -- bitonic networks are not stable.

Measured (see kernels/ms.py docstring history): the jnp formulation of
this exact network was 4x SLOWER than radix passes because XLA materialized
the per-stage interleave as relayouts; in Pallas the data never leaves
VMEM mid-block and cross-block stages are pure elementwise slabs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
BLOCK = 1 << 16
_R = BLOCK // _LANES


def _pad_tops(x, count):
    info = jnp.iinfo(x.dtype)
    return jnp.full((count,), info.max, dtype=x.dtype)


def _lex_gt(a, b, n_comps):
    gt = jnp.zeros(a[0].shape, dtype=jnp.bool_)
    eq = jnp.ones(a[0].shape, dtype=jnp.bool_)
    for i in range(n_comps):
        gt = gt | (eq & (a[i] > b[i]))
        eq = eq & (a[i] == b[i])
    return gt


def _cross_stage_kernel(n_comps, n_ops, *refs):
    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:]
    lo = [r[0, 0, 0] for r in in_refs]
    hi = [r[0, 1, 0] for r in in_refs]
    swap = _lex_gt(lo, hi, n_comps)
    for i in range(n_ops):
        out_refs[i][0, 0, 0] = jnp.where(swap, hi[i], lo[i])
        out_refs[i][0, 1, 0] = jnp.where(swap, lo[i], hi[i])


def _block_stages_kernel(n_comps, n_ops, *refs):
    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:]
    ops = [r[:, :] for r in in_refs]
    row = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)

    s = BLOCK >> 1
    while s >= _LANES:
        sr = s // _LANES
        is_lo = (row & sr) == 0
        # int32 shift operands: tpu.dynamic_rotate rejects i64 scalars,
        # and Python ints weaken to i64 when jax_enable_x64 is on
        partner = [
            pltpu.roll(o, jnp.int32(_R - sr), axis=0) for o in ops
        ]  # x[i+s] at lo
        partner_up = [
            pltpu.roll(o, jnp.int32(sr), axis=0) for o in ops
        ]  # x[i-s] at hi
        other = [
            jnp.where(is_lo, pdn, pup)
            for pdn, pup in zip(partner, partner_up)
        ]
        gt_lo = _lex_gt(ops, other, n_comps)  # at lo slots: x > x[i+s]
        lt_hi = _lex_gt(other, ops, n_comps)  # at hi slots: x[i-s] > x
        # boolean select via logic ops (Mosaic lacks i1-valued select_n)
        take_other = (is_lo & gt_lo) | (~is_lo & lt_hi)
        ops = [jnp.where(take_other, o2, o1) for o1, o2 in zip(ops, other)]
        s >>= 1
    while s >= 1:
        is_lo = (col & s) == 0
        partner = [pltpu.roll(o, jnp.int32(_LANES - s), axis=1) for o in ops]
        partner_up = [pltpu.roll(o, jnp.int32(s), axis=1) for o in ops]
        other = [
            jnp.where(is_lo, pdn, pup)
            for pdn, pup in zip(partner, partner_up)
        ]
        gt_lo = _lex_gt(ops, other, n_comps)
        lt_hi = _lex_gt(other, ops, n_comps)
        take_other = (is_lo & gt_lo) | (~is_lo & lt_hi)
        ops = [jnp.where(take_other, o2, o1) for o1, o2 in zip(ops, other)]
        s >>= 1
    for i in range(n_ops):
        out_refs[i][:, :] = ops[i]


_R_SUB = 256


def _run_cross_stage(ops, s, n_comps, interpret):
    """One half-cleaner stage with element distance s (>= BLOCK).

    Pairs are elementwise between the two partner slabs, so the sublane
    rows also split across the grid (keeps double-buffered VMEM well under
    the limit).
    """
    M = ops[0].shape[0]
    n_ops = len(ops)
    S = s // BLOCK
    G = M // (2 * s)
    views = [o.reshape(G, 2, S, _R, _LANES) for o in ops]
    spec = pl.BlockSpec(
        (1, 2, 1, _R_SUB, _LANES),
        lambda g, t, rb: (g, jnp.int32(0), t, rb, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        lambda *refs: _cross_stage_kernel(n_comps, n_ops, *refs),
        grid=(G, S, _R // _R_SUB),
        in_specs=[spec] * n_ops,
        out_specs=tuple([spec] * n_ops),
        out_shape=tuple(
            jax.ShapeDtypeStruct(v.shape, v.dtype) for v in views
        ),
        interpret=interpret,
    )(*views)
    return [o.reshape(M) for o in out]


def _run_block_stages(ops, n_comps, interpret):
    """All remaining half-cleaner stages (distance < BLOCK), one call."""
    M = ops[0].shape[0]
    n_ops = len(ops)
    nb = M // BLOCK
    views = [o.reshape(nb * _R, _LANES) for o in ops]
    spec = pl.BlockSpec(
        (_R, _LANES), lambda b: (b, jnp.int32(0)), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        lambda *refs: _block_stages_kernel(n_comps, n_ops, *refs),
        grid=(nb,),
        in_specs=[spec] * n_ops,
        out_specs=tuple([spec] * n_ops),
        out_shape=tuple(
            jax.ShapeDtypeStruct(v.shape, v.dtype) for v in views
        ),
        interpret=interpret,
    )(*views)
    return [o.reshape(M) for o in out]


def bitonic_merge(
    ops_a, ops_b, n_comps: int, interpret: bool = False, slice_output=True
):
    """Merge two sorted operand lists; returns the merged list (len a+b).

    The first n_comps arrays are comparison components (both sides sorted
    ascending by them); the rest are payloads. Pads internally to a power
    of two (>= BLOCK) with +inf components; with slice_output=False the
    padded arrays return whole (pads sorted last), which downstream
    Pallas passes can consume without re-padding.
    """
    na = int(ops_a[0].shape[0])
    nb = int(ops_b[0].shape[0])
    total = na + nb
    M = BLOCK
    while M < total:
        M <<= 1
    pad = M - total
    merged = []
    for a, b in zip(ops_a, ops_b):
        parts = [a]
        if pad:
            parts.append(_pad_tops(a, pad))
        parts.append(b[::-1])
        merged.append(jnp.concatenate(parts))

    s = M >> 1
    while s >= BLOCK:
        merged = _run_cross_stage(merged, s, n_comps, interpret)
        s >>= 1
    merged = _run_block_stages(merged, n_comps, interpret)
    if slice_output:
        return [o[:total] for o in merged]
    return merged


def _exchange(ops, other, is_lo, dirb, n_comps):
    """Directed compare-exchange: ascending when dirb==0, descending when 1."""
    gt = _lex_gt(ops, other, n_comps)   # x > other
    lt = _lex_gt(other, ops, n_comps)   # other > x
    eff_lo = is_lo ^ dirb
    take_other = (eff_lo & gt) | (~eff_lo & lt)
    return [jnp.where(take_other, o2, o1) for o1, o2 in zip(ops, other)]


def _block_roll_stage(ops, s, dirb, n_comps):
    """One in-VMEM stage with element distance s (< BLOCK)."""
    if s >= _LANES:
        sr = s // _LANES
        row = jax.lax.broadcasted_iota(jnp.int32, ops[0].shape, 0)
        is_lo = (row & sr) == 0
        down = [pltpu.roll(o, jnp.int32(_R - sr), axis=0) for o in ops]
        up = [pltpu.roll(o, jnp.int32(sr), axis=0) for o in ops]
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, ops[0].shape, 1)
        is_lo = (col & s) == 0
        down = [pltpu.roll(o, jnp.int32(_LANES - s), axis=1) for o in ops]
        up = [pltpu.roll(o, jnp.int32(s), axis=1) for o in ops]
    other = [jnp.where(is_lo, d, u) for d, u in zip(down, up)]
    return _exchange(ops, other, is_lo, dirb, n_comps)


def _block_sort_kernel(n_comps, n_ops, *refs):
    """Full bitonic sort of one block: phases 1..log2(BLOCK).

    Direction bit k of the global index: local for k < log2(BLOCK); the
    top phase's bit is the block-index parity (program_id & 1)."""
    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:]
    ops = [r[:, :] for r in in_refs]
    row = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
    lidx = row * _LANES + col
    kb = BLOCK.bit_length() - 1
    for k in range(1, kb + 1):
        if k < kb:
            dirb = ((lidx >> k) & 1) == 1
        else:
            dirb = jnp.broadcast_to(
                (pl.program_id(0) & 1) == 1, (_R, _LANES)
            )
        for j in range(k - 1, -1, -1):
            ops = _block_roll_stage(ops, 1 << j, dirb, n_comps)
    for i in range(n_ops):
        out_refs[i][:, :] = ops[i]


def _block_merge_kernel(n_comps, n_ops, dir_shift, *refs):
    """Stages with distance < BLOCK of phase k; per-block direction = bit
    dir_shift of the block index (None = always ascending)."""
    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:]
    ops = [r[:, :] for r in in_refs]
    if dir_shift is None:
        dirb = jnp.broadcast_to(jnp.bool_(False), (_R, _LANES))
    else:
        dirb = jnp.broadcast_to(
            ((pl.program_id(0) >> dir_shift) & 1) == 1, (_R, _LANES)
        )
    s = BLOCK >> 1
    while s >= 1:
        ops = _block_roll_stage(ops, s, dirb, n_comps)
        s >>= 1
    for i in range(n_ops):
        out_refs[i][:, :] = ops[i]


def _cross_stage_dir_kernel(n_comps, n_ops, dir_shift, *refs):
    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:]
    lo = [r[0, 0, 0] for r in in_refs]
    hi = [r[0, 1, 0] for r in in_refs]
    if dir_shift is None:
        dirb = jnp.broadcast_to(jnp.bool_(False), lo[0].shape)
    else:
        dirb = jnp.broadcast_to(
            ((pl.program_id(0) >> dir_shift) & 1) == 1, lo[0].shape
        )
    gt = _lex_gt(lo, hi, n_comps)
    lt = _lex_gt(hi, lo, n_comps)
    swap = (~dirb & gt) | (dirb & lt)
    for i in range(n_ops):
        out_refs[i][0, 0, 0] = jnp.where(swap, hi[i], lo[i])
        out_refs[i][0, 1, 0] = jnp.where(swap, lo[i], hi[i])


def _run_cross_stage_dir(ops, s, k_phase, n_comps, interpret):
    """Cross-block stage of a full sort: distance s >= BLOCK of phase
    k_phase; direction bit comes from the pair's leading block index."""
    M = ops[0].shape[0]
    n_ops = len(ops)
    S = s // BLOCK
    G = M // (2 * s)
    kb = BLOCK.bit_length() - 1
    # bit (k_phase - kb) of the lo block index b = g*2S + t lives in g at
    # offset (k_phase - kb) - log2(2S)
    dir_shift = (k_phase - kb) - (2 * S).bit_length() + 1
    views = [o.reshape(G, 2, S, _R, _LANES) for o in ops]
    spec = pl.BlockSpec(
        (1, 2, 1, _R_SUB, _LANES),
        lambda g, t, rb: (g, jnp.int32(0), t, rb, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        lambda *refs: _cross_stage_dir_kernel(n_comps, n_ops, dir_shift, *refs),
        grid=(G, S, _R // _R_SUB),
        in_specs=[spec] * n_ops,
        out_specs=tuple([spec] * n_ops),
        out_shape=tuple(jax.ShapeDtypeStruct(v.shape, v.dtype) for v in views),
        interpret=interpret,
    )(*views)
    return [o.reshape(M) for o in out]


def _run_block_kernel(kernel_fn, ops, interpret):
    M = ops[0].shape[0]
    n_ops = len(ops)
    nb = M // BLOCK
    views = [o.reshape(nb * _R, _LANES) for o in ops]
    spec = pl.BlockSpec((_R, _LANES), lambda b: (b, jnp.int32(0)), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel_fn,
        grid=(nb,),
        in_specs=[spec] * n_ops,
        out_specs=tuple([spec] * n_ops),
        out_shape=tuple(jax.ShapeDtypeStruct(v.shape, v.dtype) for v in views),
        interpret=interpret,
    )(*views)
    return [o.reshape(M) for o in out]


def bitonic_sort(ops, n_comps: int, interpret: bool = False):
    """Full bitonic sort of parallel operand arrays (ascending by the
    first n_comps components). Pads internally to a power of two with
    +inf components; returns arrays of the original length with the real
    elements sorted first (pads would sort last and are sliced off).

    Measured (2.36M x 3 operands, one v5e): 12.8 ms vs 8.8 ms for the
    stable-radix lax.sort passes -- the O(log^2 B) within-block network is
    VPU-bound, so the join keeps radix for the query-side sort and uses
    only :func:`bitonic_merge` (log-stage, where Pallas wins 20x). Kept
    as a correct, tested building block."""
    total = int(ops[0].shape[0])
    M = BLOCK
    while M < total:
        M <<= 1
    pad = M - total
    if pad:
        ops = [jnp.concatenate([o, _pad_tops(o, pad)]) for o in ops]
    n_ops = len(ops)
    kb = BLOCK.bit_length() - 1
    km = M.bit_length() - 1

    ops = _run_block_kernel(
        lambda *refs: _block_sort_kernel(n_comps, n_ops, *refs), ops, interpret
    )
    for k in range(kb + 1, km + 1):
        for j in range(k - 1, kb - 1, -1):
            ops = _run_cross_stage_dir(ops, 1 << j, k, n_comps, interpret)
        dir_shift = None if k == km else k - kb
        ops = _run_block_kernel(
            lambda *refs, ds=dir_shift: _block_merge_kernel(
                n_comps, n_ops, ds, *refs
            ),
            ops,
            interpret,
        )
    return [o[:total] for o in ops]
