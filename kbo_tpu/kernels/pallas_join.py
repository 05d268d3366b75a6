"""Pallas TPU kernel for the nearest-reference propagation of the sort-join.

After the merge, every query slot needs the common-prefix length with the
nearest reference slot before it and after it. The jnp path does this with
two log-depth doubling scans over (W words + flag), ~21 full-HBM round
trips each. This kernel streams the merged arrays ONCE per direction: a
sequential grid carries the last-seen reference key in SMEM, each block
resolves its own nearest references with a two-level in-VMEM "last valid"
scan (across lanes, then across sublane rows), computes the common-prefix
chunk count in-register, and writes only the int32 result.

The common-prefix count avoids `clz` (not reliably lowered by Mosaic) via
a shift/compare ladder on the XOR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
BLOCK = 1 << 16
_R = BLOCK // _LANES


def _clz32(x):
    """Count leading zeros of a uint32 vector (shift/compare ladder)."""
    n = jnp.zeros(x.shape, dtype=jnp.int32)
    for width in (16, 8, 4, 2, 1):
        bound = jnp.uint32(1) << (32 - width)
        small = x < bound
        n = jnp.where(small, n + width, n)
        x = jnp.where(small, x << width, x)
    return jnp.where(x == 0, 32, n)


def _common_chunks(a, b, bits: int):
    """Common chunk-prefix length between word lists (bits = 2 or 3)."""
    per_word = 16 if bits == 2 else 10
    lead = 0 if bits == 2 else 2
    total = jnp.zeros(a[0].shape, dtype=jnp.int32)
    alive = jnp.ones(a[0].shape, dtype=jnp.bool_)
    for w in range(len(a)):
        x = a[w] ^ b[w]
        nz = x != 0
        cw = jnp.where(nz, (_clz32(x) - lead) // bits, per_word)
        total = total + jnp.where(alive, cw, 0)
        alive = alive & ~nz
    return total


def _shift_valid(x, s, axis, reverse):
    """Shifted view feeding a last/first-valid scan, plus its in-range
    mask (no wraparound)."""
    size = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if reverse:
        rolled = pltpu.roll(x, (size - s) % size, axis=axis)
        ok = idx < size - s
    else:
        rolled = pltpu.roll(x, s, axis=axis)
        ok = idx >= s
    return rolled, ok


def _scan_last_valid(vals, seen, reverse: bool):
    """In-VMEM two-level 'last valid at-or-before' (at-or-after when
    reverse) scan over row-major [R, 128]. `seen` is int32 0/1 (Mosaic
    cannot rotate i1 vectors). Returns (vals, seen int32)."""
    R = vals[0].shape[0]
    # across lanes within each row
    s = 1
    while s < _LANES:
        sh_seen, ok = _shift_valid(seen, s, 1, reverse)
        sh_seen = jnp.where(ok, sh_seen, 0)
        use = (seen == 0) & (sh_seen == 1)
        vals = [
            jnp.where(use, _shift_valid(v, s, 1, reverse)[0], v)
            for v in vals
        ]
        seen = seen | sh_seen
        s <<= 1
    # row summaries at the scan-trailing edge of each row
    edge = 0 if reverse else _LANES - 1
    summ_vals = [v[:, edge : edge + 1] for v in vals]
    summ_seen = seen[:, edge : edge + 1]
    s = 1
    while s < R:
        sh_seen, ok = _shift_valid(summ_seen, s, 0, reverse)
        sh_seen = jnp.where(ok, sh_seen, 0)
        use = (summ_seen == 0) & (sh_seen == 1)
        summ_vals = [
            jnp.where(use, _shift_valid(v, s, 0, reverse)[0], v)
            for v in summ_vals
        ]
        summ_seen = summ_seen | sh_seen
        s <<= 1
    # exclusive row carry: rows strictly before (after, when reverse)
    excl_seen, ok = _shift_valid(summ_seen, 1, 0, reverse)
    excl_seen = jnp.where(ok, excl_seen, 0)
    excl_vals = [_shift_valid(v, 1, 0, reverse)[0] for v in summ_vals]
    use = (seen == 0) & (jnp.broadcast_to(excl_seen, seen.shape) == 1)
    vals = [
        jnp.where(use, jnp.broadcast_to(ev, v.shape), v)
        for v, ev in zip(vals, excl_vals)
    ]
    seen = seen | jnp.broadcast_to(excl_seen, seen.shape)
    return vals, seen


def _make_kernel(W: int, bits: int, reverse: bool):
    def kernel(*refs):
        word_refs = refs[:W]
        rank_ref = refs[W]
        out_ref = refs[W + 1]
        seen_ref = refs[W + 2]  # SMEM (1,) int32
        cw_ref = refs[W + 3]  # SMEM (W,) uint32
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            seen_ref[0] = 0
            for w in range(W):
                cw_ref[w] = jnp.uint32(0)

        words = [r[:, :] for r in word_refs]
        is_ref = jnp.where(rank_ref[:, :] == 0, 1, 0)
        vals, seen = _scan_last_valid(list(words), is_ref, reverse)
        carry_seen = seen_ref[0] == 1
        use_carry = (seen == 0) & carry_seen
        vals = [
            jnp.where(use_carry, cw_ref[w], v) for w, v in enumerate(vals)
        ]
        found = (seen == 1) | carry_seen
        c = _common_chunks(words, vals, bits)
        out_ref[:, :] = jnp.where(found, c, 0)

        er, ec = (0, 0) if reverse else (_R - 1, _LANES - 1)
        edge_seen = seen[er, ec]

        @pl.when(edge_seen == 1)
        def _():
            seen_ref[0] = 1
            for w in range(W):
                cw_ref[w] = vals[w][er, ec]

    return kernel


def nearest_common(words, rank, bits: int, reverse: bool, interpret=False):
    """c[i] = common chunk-prefix length of slot i's key with the nearest
    rank==0 slot at-or-before i (at-or-after when reverse); 0 if none.

    words: list of W uint32 [M] (M a multiple of BLOCK); rank: int32 [M].
    """
    W = len(words)
    M = words[0].shape[0]
    assert M % BLOCK == 0
    nb = M // BLOCK
    if reverse:
        index_map = lambda b: (nb - 1 - b, 0)
    else:
        index_map = lambda b: (b, 0)
    spec = pl.BlockSpec((_R, _LANES), index_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(W, bits, reverse),
        grid=(nb,),
        in_specs=[spec] * (W + 1),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((M // _LANES, _LANES), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((W,), jnp.uint32),
        ],
        interpret=interpret,
    )(*[w.reshape(-1, _LANES) for w in words], rank.reshape(-1, _LANES))
    return out.reshape(M)
