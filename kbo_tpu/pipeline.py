"""Fused batched device pipeline: MS -> derandomize -> translate in one jit.

This is the throughput ("kbo find/matches") hot path and the unit the
distributed layer shards: a [Q, L] batch of padded, 2-bit-encodable queries
goes in; alignment characters (and MS values/intervals for the map path) come
out, with no host round trips between stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kbo_tpu.kernels.ms import INVALID, ms_core, ms_long_core, pad_long
from kbo_tpu.kernels.postprocess import derandomize_core, translate_core
from kbo_tpu.index.sbwt import SbwtIndex


def matches_pipeline_core(table2, C, n_rows, codes, lengths, k: int, threshold):
    """codes: uint8 [Q, L] (tail-padded with INVALID); lengths: int32 [Q].

    Returns (chars uint8 [Q, L], ms int32 [Q, L], l int32 [Q, L], r [Q, L]).
    Positions past each query's length are garbage; mask with lengths.
    """
    Q, L = codes.shape
    pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
    buf = jnp.concatenate([pad, codes], axis=1).reshape(-1)
    stride = L + k - 1
    qi = jnp.arange(Q, dtype=jnp.int32)
    li = jnp.arange(L, dtype=jnp.int32)
    pos = (qi[:, None] * stride + li[None, :]).reshape(-1)
    lmax = jnp.minimum(jnp.int32(k), li + 1)[None, :]
    lmax = jnp.where(li[None, :] < lengths[:, None], lmax, 0).reshape(-1)

    ms, l, r = ms_core(table2, C, n_rows, buf, pos, lmax, k)
    ms = ms.reshape(Q, L)

    derand = jax.vmap(lambda m, n: derandomize_core(m, k, threshold, n))(
        ms, lengths
    )
    chars = jax.vmap(lambda d, n: translate_core(d, k, threshold, n))(
        derand, lengths
    )
    return chars, ms, l.reshape(Q, L), r.reshape(Q, L)


matches_pipeline = jax.jit(matches_pipeline_core, static_argnames=("k",))


def long_matches_core(
    table2, C, n_rows, buf, true_len, k: int, threshold, block: int
):
    """Fused MS -> derandomize -> translate for ONE long sequence.

    buf: uint8 [k-1 + Lp] (k-1 leading sentinels, tail-padded so that
    Lp = n_blocks * block); true_len: traced actual length. Position blocks
    run under lax.map to bound working memory while keeping one compile.
    Returns (chars, ms, l, r) each [Lp]; entries past true_len are garbage.
    """
    ms, l, r = ms_long_core(table2, C, n_rows, buf, true_len, k, block)
    derand = derandomize_core(ms, k, threshold, true_len)
    chars = translate_core(derand, k, threshold, true_len)
    return chars, ms, l, r


long_matches_pipeline = jax.jit(
    long_matches_core, static_argnames=("k", "block")
)


def long_matches_device(dev, codes: np.ndarray, threshold: int, block: int = 1 << 20):
    """Host wrapper: fused pipeline over one long encoded sequence.

    Returns (chars uint8 [L], ms int64 [L], intervals int64 [L, 2]).
    """
    k = dev.k
    buf, L, block = pad_long(np.asarray(codes), k, block=min(block, 1 << 16))
    chars, ms, l, r = long_matches_pipeline(
        dev.table2,
        dev.C,
        dev.n_rows,
        jnp.asarray(buf),
        jnp.int32(L),
        k,
        jnp.int32(threshold),
        block,
    )
    # fetch chars as int32: uint8 device->host transfers are pathologically
    # slow through the axon relay (observed 0.5MB taking minutes)
    chars = np.asarray(chars[:L].astype(jnp.int32)).astype(np.uint8)
    ms_np = np.asarray(ms[:L], dtype=np.int64)
    iv = np.stack(
        [np.asarray(l[:L], dtype=np.int64), np.asarray(r[:L], dtype=np.int64)],
        axis=1,
    )
    return chars, ms_np, iv


def pad_batch(code_list: list[np.ndarray], L: int | None = None):
    """Stack encoded queries into a [Q, L] padded batch + lengths."""
    L = L or max(c.size for c in code_list)
    Q = len(code_list)
    codes = np.full((Q, L), INVALID, dtype=np.uint8)
    lengths = np.zeros(Q, dtype=np.int32)
    for i, c in enumerate(code_list):
        codes[i, : c.size] = c
        lengths[i] = c.size
    return codes, lengths


def matches_batch(
    index: SbwtIndex, code_list: list[np.ndarray], threshold: int
) -> list[np.ndarray]:
    """Translated alignment chars (uint8 arrays) for a batch of queries."""
    from kbo_tpu.engine import device_index

    dev = device_index(index)
    codes, lengths = pad_batch(code_list)
    chars, _, _, _ = matches_pipeline(
        dev.table2,
        dev.C,
        dev.n_rows,
        jnp.asarray(codes),
        jnp.asarray(lengths),
        dev.k,
        jnp.int32(threshold),
    )
    chars = np.asarray(chars.astype(jnp.int32)).astype(np.uint8)
    return [chars[i, : c.size] for i, c in enumerate(code_list)]
