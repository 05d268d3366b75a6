"""Fused batched device pipelines: MS -> derandomize -> translate in one jit.

The throughput ("kbo find/matches") hot path and the unit the distributed
layer shards: a [Q, L] batch of padded queries goes in; alignment characters
and MS values come out with no host round trips between stages (the map
path's colex intervals are fetched sparsely afterwards -- see
engine.SparseIntervals). MS comes from the sort-join engine
(kbo_tpu.kernels.ms); derandomize/translate are the parallel reformulations
in kbo_tpu.kernels.postprocess.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kbo_tpu.index.sbwt import SbwtIndex
from kbo_tpu.kernels.ms import INVALID, DeviceIndex, ms2_core
from kbo_tpu.kernels.postprocess import derandomize_core, translate_core


def _flat_ms_to_batch(ms_flat, Q: int, L: int, k: int):
    stride = L + k - 1
    return ms_flat.reshape(Q, stride)[:, k - 1 :]


def _make_buf(codes, k: int):
    Q, L = codes.shape
    pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
    return jnp.concatenate([pad, codes], axis=1).reshape(-1)


def matches_pipeline_core(
    keys2, cap2, codes, lengths, k: int, threshold
):
    """codes: uint8 [Q, L] (tail-padded with INVALID); lengths: int32 [Q].

    Returns (chars uint8 [Q, L], ms int32 [Q, L]). Positions past each
    query's length are garbage; mask with lengths.
    """
    Q, L = codes.shape
    buf = _make_buf(codes, k)
    ms = _flat_ms_to_batch(ms2_core(keys2, cap2, buf, k), Q, L, k)
    derand = jax.vmap(lambda m, n: derandomize_core(m, k, threshold, n))(
        ms, lengths
    )
    chars = jax.vmap(lambda d, n: translate_core(d, k, threshold, n))(
        derand, lengths
    )
    return chars, ms


matches_pipeline = jax.jit(matches_pipeline_core, static_argnames=("k",))




def _bucket(n: int, lo: int = 64) -> int:
    """1/8-octave bucketing -- the single implementation lives in
    kernels.ms (shared so compile-shape bucketing never diverges)."""
    from kbo_tpu.kernels.ms import _bucket as kernel_bucket

    return kernel_bucket(n, lo=lo)


def pad_batch(code_list: list[np.ndarray], L: int | None = None, bucket=False):
    """Stack encoded queries into a [Q, L] padded batch + lengths."""
    L = L or max(c.size for c in code_list)
    if bucket:
        L = _bucket(L)
    Q = len(code_list)
    codes = np.full((Q, L), INVALID, dtype=np.uint8)
    lengths = np.zeros(Q, dtype=np.int32)
    for i, c in enumerate(code_list):
        codes[i, : c.size] = c
        lengths[i] = c.size
    return codes, lengths


def matches_ms_batch(
    index: SbwtIndex, code_list: list[np.ndarray], threshold: int
):
    """(translation chars, noisy ms) per query, one fused device batch."""
    from kbo_tpu.engine import device_index

    dev = device_index(index)
    codes, lengths = pad_batch(code_list, bucket=True)
    chars, ms = matches_pipeline(
        dev.keys2,
        dev.cap2,
        jnp.asarray(codes),
        jnp.asarray(lengths),
        dev.k,
        jnp.int32(threshold),
    )
    # fetch as int32: uint8 device->host transfers hit a pathological
    # slow path in the axon relay (~76s for 0.5MB vs 0.09s for int32)
    chars = np.asarray(chars.astype(jnp.int32)).astype(np.uint8)
    ms = np.asarray(ms, dtype=np.int64)
    return (
        [chars[i, : c.size] for i, c in enumerate(code_list)],
        [ms[i, : c.size] for i, c in enumerate(code_list)],
    )


def matches_batch(
    index: SbwtIndex, code_list: list[np.ndarray], threshold: int
) -> list[np.ndarray]:
    """Translated alignment chars (uint8 arrays) for a batch of queries.

    Fetches ONLY the chars array -- the fused pipeline's ms output stays
    on device (a [Q, L] int bulk fetch through the relay costs more than
    the compute; callers that need ms use matches_ms_batch)."""
    from kbo_tpu.engine import device_index

    dev = device_index(index)
    codes, lengths = pad_batch(code_list, bucket=True)
    chars, _ms = matches_pipeline(
        dev.keys2,
        dev.cap2,
        jnp.asarray(codes),
        jnp.asarray(lengths),
        dev.k,
        jnp.int32(threshold),
    )
    # fetch as int32: uint8 device->host transfers hit a pathological
    # slow path in the axon relay (~76s for 0.5MB vs 0.09s for int32)
    chars = np.asarray(chars.astype(jnp.int32)).astype(np.uint8)
    return [chars[i, : c.size] for i, c in enumerate(code_list)]


@functools.partial(jax.jit, static_argnames=("k",))
def _matches_seq_jit(ref_words, codes, lengths, k, threshold):
    from kbo_tpu.kernels.ms import ms3_values_vs_sorted_seq_core

    ms = ms3_values_vs_sorted_seq_core(ref_words, codes, k)
    derand = jax.vmap(
        lambda m, n: derandomize_core(m, k, threshold, n)
    )(ms, lengths)
    return jax.vmap(
        lambda d, n: translate_core(d, k, threshold, n)
    )(derand, lengths)


def matches_batch_seq(
    dev_index, code_list: list[np.ndarray], threshold: int
) -> list[np.ndarray]:
    """Batched translated alignment chars against a device-built
    :class:`kbo_tpu.kernels.ms.DeviceSeqIndex` (index-free find path).
    The jit lives at module level so repeated calls (one per (contig,
    query-file) pair under --device-index --detailed) hit its cache."""
    run = _matches_seq_jit

    codes, lengths = pad_batch(code_list, bucket=True)
    chars = run(
        tuple(dev_index.ref_words),
        jnp.asarray(codes),
        jnp.asarray(lengths),
        dev_index.k,
        jnp.int32(threshold),
    )
    # fetch as int32: uint8 device->host transfers hit a pathological
    # slow path in the axon relay (~76s for 0.5MB vs 0.09s for int32)
    chars = np.asarray(chars.astype(jnp.int32)).astype(np.uint8)
    return [chars[i, : c.size] for i, c in enumerate(code_list)]
