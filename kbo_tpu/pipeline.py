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


def pack_codes_host(codes: np.ndarray, lengths) -> np.ndarray | None:
    """2-bit pack a clean [Q, L] code batch (4 bases/byte, little-endian
    nibble order like kernels.mapsweep.pack_ascii_host): the serving
    path's query upload drops to 1/4 of the raw bytes, which through the
    relay is the difference between an upload-bound and a compute-bound
    batch (BASELINE.md round-5 scaling). Returns None when any in-length
    code is outside 1..4 (N runs, '$') or L % 4 != 0 -- the caller keeps
    the raw upload; the exceptional batch costs bandwidth, not
    correctness. Tail padding needs no exception list: the device decode
    reconstructs INVALID beyond each row's length."""
    Q, L = codes.shape
    if L % 4:
        return None
    lens = np.asarray(lengths)[:Q]
    in_len = np.arange(L, dtype=np.int64)[None, :] < lens[:, None]
    if (in_len & ((codes < 1) | (codes > 4))).any():
        return None
    v = (
        np.where(in_len, codes, 1).astype(np.uint8) - np.uint8(1)
    ).reshape(Q, L // 4, 4).view(np.uint32)[..., 0] & np.uint32(0x03030303)
    return ((v | (v >> 6) | (v >> 12) | (v >> 18)) & 0xFF).astype(np.uint8)


@jax.jit
def decode_packed_codes_device(packed4, lengths):
    """Device twin of :func:`pack_codes_host`: exact [Q, L] codes (1..4
    in length, INVALID beyond)."""
    Q, Lp = packed4.shape
    L = Lp * 4
    parts = [
        ((packed4 >> jnp.uint8(2 * j)) & jnp.uint8(3)) for j in range(4)
    ]
    u2 = jnp.stack(parts, axis=-1).reshape(Q, L) + jnp.uint8(1)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    return jnp.where(idx < lengths[:, None], u2, jnp.uint8(INVALID))


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


# ----------------------------------------------------- device RLE (find)


def _rle_structs(packed: np.ndarray, cap: int, code_list):
    """[Q, 1+5*cap] int32 -> per-query RLE lists (None if any row
    overflowed `cap`)."""
    from kbo_tpu.ops.format import RLE

    out = []
    for i, _ in enumerate(code_list):
        row = packed[i]
        cnt = int(row[0])
        if cnt > cap:
            return None
        cols = row[1:].reshape(5, cap)
        out.append(
            [
                RLE(
                    start=int(cols[0, s]),
                    end=int(cols[1, s]),
                    matches=int(cols[2, s]),
                    mismatches=int(cols[3, s]),
                    jumps=int(cols[4, s]),
                )
                for s in range(cnt)
            ]
        )
    return out


def _rle_structs_global(vec: np.ndarray, q_rows: int, cap_total: int):
    """Flat [1 + q_rows + 5*cap_total] int32 (kernels.postprocess
    rle_segments_global_core) -> per-row RLE lists, or None when the
    shared table overflowed ``cap_total``."""
    from kbo_tpu.ops.format import RLE

    total = int(vec[0])
    if total > cap_total:
        return None
    counts = vec[1 : 1 + q_rows]
    cols = vec[1 + q_rows :].reshape(5, cap_total)
    out = []
    off = 0
    for q in range(q_rows):
        cnt = int(counts[q])
        out.append(
            [
                RLE(
                    start=int(cols[0, off + s]),
                    end=int(cols[1, off + s]),
                    matches=int(cols[2, off + s]),
                    mismatches=int(cols[3, off + s]),
                    jumps=int(cols[4, off + s]),
                )
                for s in range(cnt)
            ]
        )
        off += cnt
    return out


def _rle_from_device_chars(chars_dev, lengths, code_list):
    """Device chars [Q, L] -> RLE lists via the GLOBAL device segmentation
    kernel: one flat counts+table fetch sized by the true total segment
    count, not Q x worst-row (capacity-quadrupling retry)."""
    from kbo_tpu.kernels.postprocess import rle_segments_global

    Q, L = chars_dev.shape
    cap = _bucket(max(128, 2 * Q), lo=128)
    lengths_dev = jnp.asarray(lengths)
    while True:
        vec = np.asarray(rle_segments_global(chars_dev, lengths_dev, cap))
        out = _rle_structs_global(vec, Q, cap)
        if out is not None:
            return out
        cap = min(cap * 4, Q * ((L + 1) // 2 + 1))


def find_rle_batch(
    index: SbwtIndex, code_list: list[np.ndarray], threshold: int
):
    """Batched find segments with DEVICE RLE extraction (max_gap_len == 0
    semantics): the full chars array never leaves the device -- one compact
    [Q, 1+5*cap] int32 fetch replaces the [Q, L] download."""
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
    return _rle_from_device_chars(chars, lengths, code_list)


def find_rle_batch_seq(dev_index, code_list: list[np.ndarray], threshold: int):
    """Device-RLE find against a device-built sequence index."""
    codes, lengths = pad_batch(code_list, bucket=True)
    chars = _matches_seq_jit(
        tuple(dev_index.ref_words),
        jnp.asarray(codes),
        jnp.asarray(lengths),
        dev_index.k,
        jnp.int32(threshold),
    )
    return _rle_from_device_chars(chars, lengths, code_list)
