"""Pallas TPU kernels for the derandomize + translate passes.

The jnp formulations (kbo_tpu/kernels/postprocess.py) are log-depth
doubling scans: ~21 full-array HBM round trips each. These kernels stream
the array ONCE: a sequential grid walks blocks (TPU grids execute in
order on a core, so SMEM scratch carries state between blocks), and the
scan *within* a block runs in VMEM with axis-aligned rolls -- a two-level
(across-lanes, then across-sublanes) suffix scan over the [R, 128] tile.

Pass 1 (right-to-left grid): derandomize. Per element the recurrence is a
point function in phi-space (see postprocess.py); blocks compose their
suffix scans with the carried composition of all blocks to their right.

Pass 2 (left-to-right grid): translate. Needs d[i-1], d[i+1] (block-edge
neighbors come from the carry and from a duplicate input mapped one block
ahead) and the pair-skip parity, whose "last position where the skip chain
breaks" is a running prefix max carried in SMEM.

Status: bit-exact against the jnp cores both interpreted and compiled on
TPU (tests/test_pallas_postprocess.py). Measured at 2M positions on one
v5e, both implementations run sub-millisecond -- XLA fuses the doubling
scans well enough that this stage is nowhere near the pipeline bottleneck
(the sort passes are), so the default pipeline keeps the jnp path. The
kernels stay as the reference implementation of the sequential-grid +
SMEM-carry streaming pattern that a future Pallas sort/merge kernel for
the actual bottleneck would build on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_M, _X, _DASH, _R = ord("M"), ord("X"), ord("-"), ord("R")

BLOCK = 1 << 17  # [1024, 128] int32 tiles per descriptor
_LANES = 128


def _compose(f, g):
    """Composition f o g of (is_id, is_const, q, v, r) descriptors.

    int32 flags (1/0) so every component lives in the same tile dtype.
    """
    f_id, f_c, f_q, f_v, f_r = f
    g_id, g_c, g_q, g_v, g_r = g

    def apply_f(x):
        return jnp.where(
            f_id == 1, x, jnp.where(f_c == 1, f_v, jnp.where(x == f_q, f_v, f_r))
        )

    h_v = apply_f(g_v)
    h_r = apply_f(g_r)
    out_id = f_id * g_id
    out_c = (1 - out_id) * jnp.where((g_c == 1) | ((g_id == 1) & (f_c == 1)), 1, 0)
    out_q = jnp.where(g_id == 1, f_q, g_q)
    out_v = jnp.where(g_id == 1, f_v, h_v)
    out_r = jnp.where(g_id == 1, f_r, h_r)
    return (out_id, out_c, out_q, out_v, out_r)


_IDENT = (1, 0, 0, 0, 0)


def _shift_from_right(x, s: int, axis: int, fill):
    """y[.., i, ..] = x[.., i + s, ..]; positions hanging past the end get
    `fill` (no wraparound)."""
    size = x.shape[axis]
    rolled = pltpu.roll(x, jnp.int32((-s) % size), axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx < size - s, rolled, fill)


def _suffix_scan_block(desc):
    """In-VMEM suffix composition scan over a [R, 128] descriptor tuple
    (row-major flat order). Returns the inclusive suffix scan."""
    R = desc[0].shape[0]
    # across lanes within each row
    s = 1
    while s < _LANES:
        shifted = tuple(
            _shift_from_right(d, s, 1, f) for d, f in zip(desc, _IDENT)
        )
        desc = _compose(desc, shifted)
        s <<= 1
    # row summaries (column 0) composed across rows, exclusive
    summ = tuple(d[:, :1] for d in desc)  # [R, 1]
    s = 1
    while s < R:
        shifted = tuple(
            _shift_from_right(x, s, 0, f) for x, f in zip(summ, _IDENT)
        )
        summ = _compose(summ, shifted)
        s <<= 1
    excl = tuple(
        _shift_from_right(x, 1, 0, f) for x, f in zip(summ, _IDENT)
    )
    return _compose(desc, tuple(jnp.broadcast_to(x, desc[0].shape) for x in excl))


def _derand_kernel(len_ref, ms_ref, out_ref, carry_ref):
    nb = pl.num_programs(0)
    j = pl.program_id(0)
    true_len = len_ref[0]
    k = len_ref[1]
    t = len_ref[2]
    R = BLOCK // _LANES

    @pl.when(j == 0)
    def _():
        carry_ref[0] = 1  # identity
        carry_ref[1] = 0
        carry_ref[2] = 0
        carry_ref[3] = 0
        carry_ref[4] = 0

    block_col = nb - 1 - j
    base = block_col * BLOCK
    noisy = ms_ref[:, :]
    idx = (
        base
        + jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    )

    a = noisy - idx
    is_k = noisy == k
    is_soft = (noisy > t) & ~is_k
    is_id = jnp.where(~is_k & ~is_soft, 1, 0)
    is_const = jnp.where(is_k, 1, 0)
    q = a - 1
    v = jnp.where(is_k, a, a - 1)
    r = a
    # the final in-range element is the constant (noisy > t ? noisy : 0) - i
    nlast = noisy  # elementwise; selected via mask below
    vlast = jnp.where(nlast > t, nlast, 0) - idx
    last = idx == true_len - 1
    is_id = jnp.where(last, 0, is_id)
    is_const = jnp.where(last, 1, is_const)
    v = jnp.where(last, vlast, v)
    # out-of-range positions are identity
    oob = idx >= true_len
    is_id = jnp.where(oob, 1, is_id)
    is_const = jnp.where(oob, 0, is_const)

    desc = (is_id, is_const, q, v, r)
    scanned = _suffix_scan_block(desc)
    carry = tuple(
        jnp.full((R, _LANES), carry_ref[i], jnp.int32) for i in range(5)
    )
    total = _compose(scanned, carry)
    _, c_c, _, c_v, c_r = total
    phi = jnp.where(c_c == 1, c_v, c_r)  # in-range suffixes end in a constant
    out_ref[:, :] = phi + idx

    # new carry = whole-block composition o old carry (= total at [0, 0])
    for i in range(5):
        carry_ref[i] = total[i][0, 0]


def _translate_kernel(len_ref, d_ref, dnext_ref, out_ref, carry_ref):
    j = pl.program_id(0)
    true_len = len_ref[0]
    k = len_ref[1]
    t = len_ref[2]
    R = BLOCK // _LANES

    @pl.when(j == 0)
    def _():
        carry_ref[0] = -1  # last_false of the skip chain
        carry_ref[1] = 0  # d at the previous block's last element
        carry_ref[2] = 0  # rr flag of the previous block's last element

    base = j * BLOCK
    d = d_ref[:, :]
    idx = (
        base
        + jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)

    # prev[i] = d[i-1] with the block edge coming from the carry
    lane_prev = pltpu.roll(d, jnp.int32(1), axis=1)
    row_prev = pltpu.roll(lane_prev, jnp.int32(1), axis=0)
    prev_d = jnp.where(col == 0, row_prev, lane_prev)
    prev_d = jnp.where((col == 0) & (row == 0), carry_ref[1], prev_d)
    # nxt[i] = d[i+1]; the block's last element reads the next block's first
    lane_next = pltpu.roll(d, jnp.int32(_LANES - 1), axis=1)
    row_next = pltpu.roll(lane_next, jnp.int32(R - 1), axis=0)
    nxt_d = jnp.where(col == _LANES - 1, row_next, lane_next)
    nxt_d = jnp.where(
        (col == _LANES - 1) & (row == R - 1), dnext_ref[0, 0], nxt_d
    )

    prev = jnp.where(idx > 1, prev_d, k)
    nxt = jnp.where(idx < true_len - 1, nxt_d, d)

    rr = (d > t) & (nxt_d > 0) & (nxt_d < t) & (idx < true_len - 1)
    # A[p] = rr at p-1, valid in (1, true_len-1)
    lane_rp = pltpu.roll(rr.astype(jnp.int32), jnp.int32(1), axis=1)
    row_rp = pltpu.roll(lane_rp, jnp.int32(1), axis=0)
    rr_prev = jnp.where(col == 0, row_rp, lane_rp)
    rr_prev = jnp.where((col == 0) & (row == 0), carry_ref[2], rr_prev)
    A = (idx > 1) & (idx < true_len - 1) & (rr_prev == 1)

    # last_false = running max of positions where A is false (prefix scan
    # across the block, then combined with the carried max)
    masked = jnp.where(A, jnp.int32(-1), idx)
    x = masked
    s = 1
    while s < _LANES:
        rolled = pltpu.roll(x, jnp.int32(s), axis=1)
        x = jnp.maximum(x, jnp.where(col >= s, rolled, jnp.int32(-1)))
        s <<= 1
    summ = x[:, _LANES - 1 :]  # [R, 1] row maxima
    s = 1
    while s < R:
        rolled = pltpu.roll(summ, jnp.int32(s), axis=0)
        summ = jnp.maximum(
            summ,
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, summ.shape, 0) >= s,
                rolled,
                jnp.int32(-1),
            ),
        )
        s <<= 1
    excl_rows = pltpu.roll(summ, jnp.int32(1), axis=0)
    excl_rows = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, summ.shape, 0) >= 1,
        excl_rows,
        jnp.int32(-1),
    )
    last_false = jnp.maximum(
        jnp.maximum(x, jnp.broadcast_to(excl_rows, x.shape)), carry_ref[0]
    )
    skip = A & (((idx - last_false) & 1) == 1)

    x_char = (nxt == 1) & (prev > 0)
    base_c = jnp.where(
        rr,
        _R,
        jnp.where(d <= 0, jnp.where(x_char, _X, _DASH), _M),
    ).astype(jnp.int32)
    out_ref[:, :] = jnp.where(skip, _R, base_c)

    carry_ref[0] = last_false[R - 1, _LANES - 1]
    carry_ref[1] = d[R - 1, _LANES - 1]
    carry_ref[2] = rr.astype(jnp.int32)[R - 1, _LANES - 1]



def fused_postprocess_core(ms, k, threshold, true_len, interpret=False):
    """derandomize + translate of an int32 ms vector [L] (L % BLOCK == 0).

    Returns chars int32 [L] (ASCII codes). Positions past true_len are
    garbage.
    """
    L = ms.shape[0]
    assert L % BLOCK == 0
    nb = L // BLOCK
    R = BLOCK // _LANES
    params = jnp.stack(
        [
            jnp.asarray(true_len, jnp.int32),
            jnp.asarray(k, jnp.int32),
            jnp.asarray(threshold, jnp.int32),
        ]
    )
    ms2 = ms.astype(jnp.int32).reshape(-1, _LANES)

    derand_call = pl.pallas_call(
        _derand_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (R, _LANES),
                lambda j: (nb - 1 - j, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (R, _LANES), lambda j: (nb - 1 - j, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L // _LANES, _LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((5,), jnp.int32)],
        interpret=interpret,
    )
    derand = derand_call(params, ms2)

    translate_call = pl.pallas_call(
        _translate_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (R, _LANES), lambda j: (j, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            # the next block (clamped): supplies d[block_end + 1]
            pl.BlockSpec(
                (R, _LANES),
                lambda j: (jnp.minimum(j + 1, nb - 1), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (R, _LANES), lambda j: (j, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L // _LANES, _LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )
    chars = translate_call(params, derand, derand)
    return chars.reshape(L)
