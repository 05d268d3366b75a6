"""Differential tests for the fused 3-bit join (ms + uniqueness + row).

kernels.ms.ms3_rows_core derives per-position interval uniqueness from
the LCS identity (the block of rows sharing a depth-m prefix is
delimited by adjacent-row LCS < m) instead of floor/ceil counting; these
tests pin it bit-exactly against the host oracle's full interval pass
(reference semantics: sbwt StreamingIndex.matching_statistics intervals,
consumed at src/variant_calling.rs:271-272 and src/gap_filling.rs:127-151).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from kbo_tpu import BuildOpts, build
from kbo_tpu import engine
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.kernels.ms import INVALID, lcs3_from_keys3, ms3_rows_core
from kbo_tpu.ops.ms import query_ms_codes


def _roundtrip(idx, codes, k):
    dev = engine.device_index(idx)
    buf = np.concatenate([np.full(k - 1, INVALID, np.uint8), codes])
    ms, uniq, row = ms3_rows_core(
        dev.keys3, dev.lcs3, jnp.asarray(buf), k
    )
    sl = slice(k - 1, None)
    return np.asarray(ms)[sl], np.asarray(uniq)[sl], np.asarray(row)[sl]


@pytest.mark.parametrize("k", [7, 15, 31, 51])
def test_ms3_rows_matches_oracle_intervals(k):
    rng = np.random.default_rng(1000 + k)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    # multi-contig reference to exercise '$'-dummy rows
    segs = [
        bases[rng.integers(0, 4, int(rng.integers(80, 1200)))].tobytes()
        for _ in range(3)
    ]
    idx = build(segs, BuildOpts(k=k))
    q = bytearray(segs[0][:400] + segs[1][:200])
    for p in rng.integers(0, len(q), 10):
        q[p] = bases[rng.integers(0, 4)]
    codes = encode_ascii(bytes(q))

    ms, uniq, row = _roundtrip(idx, codes, k)
    ms_h, iv_h = query_ms_codes(idx, codes)
    np.testing.assert_array_equal(ms, ms_h)
    uniq_h = (iv_h[:, 1] - iv_h[:, 0]) == 1
    np.testing.assert_array_equal(uniq, uniq_h)
    sel = np.flatnonzero(uniq_h)
    np.testing.assert_array_equal(row[sel], iv_h[sel, 0])


def test_ms3_rows_lcs_matches_host_lcs():
    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bases[rng.integers(0, 4, 3000)].tobytes()
    k = 31
    idx = build([seq], BuildOpts(k=k))
    dev = engine.device_index(idx)
    lcs_dev = np.asarray(lcs3_from_keys3(dev.keys3, k))
    # host lcs is per real row; device table may carry a sentinel tail
    np.testing.assert_array_equal(
        lcs_dev[: idx.n_rows], np.asarray(idx.lcs, dtype=np.int64)
    )
