"""Parallel derandomize/translate kernels vs sequential references.

The derandomize equivalence requires +1-Lipschitz inputs (true MS vectors
satisfy noisy[i+1] <= noisy[i] + 1); generators below enforce it.
"""

import numpy as np
import pytest

from kbo_tpu import BuildOpts, build
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.kernels.postprocess import derandomize_ms_device, translate_ms_device
from kbo_tpu.ops.derandomize import derandomize_ms_vec, random_match_threshold
from kbo_tpu.ops.ms import query_ms_codes
from kbo_tpu.ops.translate import translate_ms_vec

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _lipschitz_ms(rng, L, k):
    """Random vector with noisy[i+1] <= noisy[i]+1, values in [0, k]."""
    out = np.zeros(L, dtype=np.int64)
    cur = int(rng.integers(0, k + 1))
    for i in range(L):
        out[i] = cur
        step = rng.choice([1, 1, 1, 0, -rng.integers(0, k + 1)])
        cur = int(np.clip(cur + step, 0, k))
    return out


def test_derandomize_golden():
    noisy = np.array([1, 2, 2, 3, 2, 2, 3, 2, 1, 2, 3, 1, 1, 1, 2, 3, 1, 2])
    expected = [0, 1, 2, 3, 1, 2, 3, 0, 1, 2, 3, -1, 0, 1, 2, 3, -1, 0]
    assert derandomize_ms_device(noisy, 3, 2).tolist() == expected


@pytest.mark.parametrize("seed", range(8))
def test_derandomize_differential_synthetic(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 64))
    t = int(rng.integers(2, k + 1))
    noisy = _lipschitz_ms(rng, 300, k)
    ref = derandomize_ms_vec(noisy, k, t)
    dev = derandomize_ms_device(noisy, k, t)
    np.testing.assert_array_equal(dev, ref)


@pytest.mark.parametrize("seed", range(4))
def test_derandomize_translate_differential_real_ms(seed):
    """End-to-end on genuine MS vectors from mutated sequence pairs."""
    rng = np.random.default_rng(100 + seed)
    ref_seq = BASES[rng.integers(0, 4, 500)].tobytes()
    q = bytearray(ref_seq)
    for p in rng.integers(10, 490, 12):
        q[p] = BASES[rng.integers(0, 4)]
    k = int(rng.integers(5, 33))
    sbwt = build([bytes(q)], BuildOpts(k=k))
    noisy, _ = query_ms_codes(sbwt, encode_ascii(ref_seq))
    t = max(2, random_match_threshold(k, sbwt.n_kmers, 4, 0.001))
    ref_d = derandomize_ms_vec(noisy, k, t)
    dev_d = derandomize_ms_device(noisy, k, t)
    np.testing.assert_array_equal(dev_d, ref_d)

    ref_t = translate_ms_vec(ref_d, k, t)
    dev_t = translate_ms_device(dev_d, k, t)
    assert dev_t == ref_t


def test_translate_golden():
    ms = [0, 1, 2, 3, 1, 2, 3, 0, 1, 2, 3, -1, 0, 1, 2, 3, -1, 0]
    assert translate_ms_device(np.array(ms), 3, 2) == list("XMMRRMMXMMM--MMM--")
    ms = [1, 2, 3, 1, 2, 3, 3, 3, 3, 1, 2, 3]
    assert translate_ms_device(np.array(ms), 3, 2) == list("MMRRMMMMRRMM")


@pytest.mark.parametrize("seed", range(8))
def test_translate_differential_synthetic(seed):
    rng = np.random.default_rng(200 + seed)
    k = int(rng.integers(3, 64))
    t = int(rng.integers(2, k))
    noisy = _lipschitz_ms(rng, 257, k)
    d = derandomize_ms_vec(noisy, k, t)
    assert translate_ms_device(d, k, t) == translate_ms_vec(d, k, t)


def test_blocked_scan_branch():
    """Large non-power-of-two L exercises the doubling-scan tail handling."""
    rng = np.random.default_rng(9)
    L = (1 << 16) + 12345
    k, t = 31, 11
    noisy = _lipschitz_ms_fast(rng, L, k)
    ref = derandomize_ms_vec(noisy, k, t)
    dev = derandomize_ms_device(noisy, k, t)
    np.testing.assert_array_equal(dev, ref)
    assert translate_ms_device(dev, k, t) == translate_ms_vec(ref, k, t)


def _lipschitz_ms_fast(rng, L, k):
    """Vectorized +1-Lipschitz generator (the loop version is too slow here)."""
    steps = rng.choice([1, 1, 1, 0, -3, -9, -30], size=L)
    out = np.zeros(L, dtype=np.int64)
    cur = int(rng.integers(0, k + 1))
    # enforce the Lipschitz bound with a clamped walk
    for i in range(L):
        out[i] = cur
        cur = int(min(max(cur + steps[i], 0), k))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rle_segments_global_matches_per_row(seed):
    """The batch-global segment table (one dense row-major table + per-row
    counts) must reproduce the per-row kernel's segments exactly --
    including empty rows, all-gap rows, rows ending mid-segment, and
    varying lengths."""
    import jax.numpy as jnp

    from kbo_tpu.kernels.postprocess import (
        rle_segments,
        rle_segments_global,
    )

    rng = np.random.default_rng(seed)
    Q, L = 7, 256
    alphabet = np.frombuffer(b"MXR- ", np.uint8)
    chars = alphabet[rng.integers(0, 5, (Q, L))]
    chars[2, :] = ord("-")          # all-gap row: zero segments
    chars[3, :] = ord("M")          # one full-row segment
    lengths = np.asarray([L, 100, 50, L, 0, 1, 37], np.int32)

    cap = 64
    per_row = np.asarray(
        rle_segments(jnp.asarray(chars), jnp.asarray(lengths), cap)
    )
    cap_total = 512
    vec = np.asarray(
        rle_segments_global(
            jnp.asarray(chars), jnp.asarray(lengths), cap_total
        )
    )
    total = int(vec[0])
    counts = vec[1 : 1 + Q]
    cols = vec[1 + Q :].reshape(5, cap_total)
    assert total == int(counts.sum())
    off = 0
    for q in range(Q):
        cnt_row = int(per_row[q, 0])
        assert int(counts[q]) == cnt_row
        pr = per_row[q, 1:].reshape(5, cap)
        for s in range(cnt_row):
            for comp in range(5):
                assert cols[comp, off + s] == pr[comp, s], (q, s, comp)
        off += cnt_row
