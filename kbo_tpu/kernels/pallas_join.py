"""Pallas TPU kernels for the propagation stage of the sort-join.

After the merge, every query slot needs the best achievable match against
the reference rows around it. Reference rows carry a *cap*: k for real
k-mer rows, the real-suffix length v for '$'-padded dummy rows. The value
a query q gets from a source row s is ``min(lcp(q, s), cap_s)``, and by the
classic LCP lemma (``lcp(x, z) = min(lcp(x, y), lcp(y, z))`` for colex-sorted
x <= y <= z) the best over all sources on one side is an associative scan of
*clamp transforms*::

    x -> max(min(x, l_i), cap_i)        (cap_i = -1 at non-source slots)

where ``l_i`` is the common-prefix length between merged slots i-1 and i.
Two transforms compose into another clamp transform::

    (a1,b1) then (a2,b2)  ==  (min(a1,a2), max(min(b1,a2), b2))

so the whole pass is one streaming scan per direction -- this kernel. It
replaces both the nearest-reference propagation and the separate
O(#dummies * #queries) dummy pass of the round-1 engine: dummy rows are
just sources with small caps.

The kernel streams the merged arrays once per direction: a sequential grid
carries the scan value and the block-boundary key in SMEM; each block
computes adjacent common-prefix lengths in-register (shift/compare ladder
instead of `clz`, which Mosaic does not reliably lower) and runs a
two-level (lanes, then sublane rows) compose scan in VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
BLOCK = 1 << 16
_R = BLOCK // _LANES

_IDA = 2**31 - 1  # identity clamp component: min(x, +inf)
_IDB = -(2**31 - 1)  # identity clamp component: max(x, -inf)


def _clz32(x):
    """Count leading zeros of a uint32 vector (shift/compare ladder).

    All literals are explicit int32/uint32: under jax_enable_x64 a bare
    Python int traces as a weak i64 scalar, and Mosaic cannot lower the
    resulting i64->i32 converts (infinite _convert_helper recursion).
    """
    n = jnp.zeros(x.shape, dtype=jnp.int32)
    for width in (16, 8, 4, 2, 1):
        bound = jnp.uint32(1 << (32 - width))
        small = x < bound
        n = jnp.where(small, n + jnp.int32(width), n)
        x = jnp.where(small, x << jnp.uint32(width), x)
    return jnp.where(x == 0, jnp.int32(32), n)


def _common_chunks(a, b, bits: int):
    """Common chunk-prefix length between word lists (bits = 2 or 3)."""
    per_word = 16 if bits == 2 else 10
    lead = 0 if bits == 2 else 2
    total = jnp.zeros(a[0].shape, dtype=jnp.int32)
    alive = jnp.ones(a[0].shape, dtype=jnp.bool_)
    for w in range(len(a)):
        x = a[w] ^ b[w]
        nz = x != 0
        cw = jnp.where(
            nz,
            (_clz32(x) - jnp.int32(lead)) // jnp.int32(bits),
            jnp.int32(per_word),
        )
        total = total + jnp.where(alive, cw, jnp.int32(0))
        alive = alive & ~nz
    return total


def _shift_valid(x, s, axis, reverse):
    """Shifted view plus its in-range mask (no wraparound)."""
    size = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if reverse:
        rolled = pltpu.roll(x, jnp.int32((size - s) % size), axis=axis)
        ok = idx < size - s
    else:
        rolled = pltpu.roll(x, jnp.int32(s), axis=axis)
        ok = idx >= s
    return rolled, ok


def _linear_neighbor(x, reverse: bool):
    """Row-major previous element (next when reverse) over a [R, 128] tile.

    The first element along the scan direction wraps; callers patch it.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if reverse:
        within = pltpu.roll(x, jnp.int32(_LANES - 1), axis=1)  # x[r, c+1]
        cross = pltpu.roll(within, jnp.int32(x.shape[0] - 1), axis=0)  # x[r+1, 0] at c=127
        return jnp.where(col == _LANES - 1, cross, within)
    within = pltpu.roll(x, jnp.int32(1), axis=1)  # x[r, c-1]
    cross = pltpu.roll(within, jnp.int32(1), axis=0)  # x[r-1, 127] at c=0
    return jnp.where(col == 0, cross, within)


def _compose(Ao, Bo, Ac, Bc):
    """(older transform) then (current transform) -> combined clamp."""
    return jnp.minimum(Ao, Ac), jnp.maximum(jnp.minimum(Bo, Ac), Bc)


def _compose_scan(A, B, reverse: bool):
    """Inclusive two-level compose scan of clamp transforms over [R, 128]."""
    R = A.shape[0]
    s = 1
    while s < _LANES:
        Ao, ok = _shift_valid(A, s, 1, reverse)
        Bo, _ = _shift_valid(B, s, 1, reverse)
        Ao = jnp.where(ok, Ao, jnp.int32(_IDA))
        Bo = jnp.where(ok, Bo, jnp.int32(_IDB))
        A, B = _compose(Ao, Bo, A, B)
        s <<= 1
    # full-row summaries at the scan-trailing edge of each row
    edge = 0 if reverse else _LANES - 1
    sA = A[:, edge : edge + 1]
    sB = B[:, edge : edge + 1]
    s = 1
    while s < R:
        Ao, ok = _shift_valid(sA, s, 0, reverse)
        Bo, _ = _shift_valid(sB, s, 0, reverse)
        Ao = jnp.where(ok, Ao, jnp.int32(_IDA))
        Bo = jnp.where(ok, Bo, jnp.int32(_IDB))
        sA, sB = _compose(Ao, Bo, sA, sB)
        s <<= 1
    # exclusive row carry applied below each slot's in-row prefix
    cA, ok = _shift_valid(sA, 1, 0, reverse)
    cB, _ = _shift_valid(sB, 1, 0, reverse)
    cA = jnp.where(ok, cA, jnp.int32(_IDA))
    cB = jnp.where(ok, cB, jnp.int32(_IDB))
    A, B = _compose(
        jnp.broadcast_to(cA, A.shape), jnp.broadcast_to(cB, B.shape), A, B
    )
    return A, B


def _make_clamp_kernel(W: int, bits: int, reverse: bool):
    def kernel(*refs):
        word_refs = refs[:W]
        cap_ref = refs[W]
        out_ref = refs[W + 1]
        x_ref = refs[W + 2]  # SMEM (1,) int32: scan value carry
        bw_ref = refs[W + 3]  # SMEM (W,) uint32: boundary slot's key words
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            x_ref[0] = jnp.int32(-1)
            for w in range(W):
                bw_ref[w] = jnp.uint32(0)

        words = [r[:, :] for r in word_refs]
        row = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
        if reverse:
            first = (row == _R - 1) & (col == _LANES - 1)
            er, ec = 0, 0
        else:
            first = (row == 0) & (col == 0)
            er, ec = _R - 1, _LANES - 1
        prev = [
            jnp.where(first, bw_ref[w], _linear_neighbor(words[w], reverse))
            for w in range(W)
        ]
        ell = _common_chunks(words, prev, bits)
        # the very first slot overall has no neighbor; its edge is unused
        # because the carry is still -1, but keep it harmless anyway
        ell = jnp.where(first & (j == 0), jnp.int32(0), ell)
        A, B = _compose_scan(ell, cap_ref[:, :], reverse)
        x0 = x_ref[0]
        out = jnp.maximum(jnp.minimum(x0, A), B)
        out_ref[:, :] = out

        x_ref[0] = out[er, ec]
        for w in range(W):
            bw_ref[w] = words[w][er, ec]

    return kernel


def clamp_scan(words, cap, bits: int, reverse: bool, interpret=False):
    """best[i] = max over source slots s at-or-before i (at-or-after when
    reverse) of min(lcp(slot_i, slot_s), cap[s]); -1 if none.

    words: list of W uint32 [M] colex-sorted keys (M a multiple of BLOCK);
    cap: int32 [M], -1 at non-source (query) slots. A slot's own cap
    participates (for queries cap = -1, a no-op).
    """
    W = len(words)
    M = words[0].shape[0]
    assert M % BLOCK == 0
    nb = M // BLOCK
    if reverse:
        index_map = lambda b: (nb - 1 - b, jnp.int32(0))
    else:
        index_map = lambda b: (b, jnp.int32(0))
    spec = pl.BlockSpec((_R, _LANES), index_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_clamp_kernel(W, bits, reverse),
        grid=(nb,),
        in_specs=[spec] * (W + 1),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((M // _LANES, _LANES), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((W,), jnp.uint32),
        ],
        interpret=interpret,
    )(*[w.reshape(-1, _LANES) for w in words], cap.reshape(-1, _LANES))
    return out.reshape(M)
