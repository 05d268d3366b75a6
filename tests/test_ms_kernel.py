"""Device MS kernel vs host oracle: golden + randomized differential tests."""

import numpy as np
import pytest

from kbo_tpu import BuildOpts, build
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.kernels.ms import query_ms_device, query_ms_values_device
from kbo_tpu.ops.ms import query_ms_codes

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def test_golden_vector():
    # reference: src/index.rs:238-240
    sbwt = build([b"AAAGAACCA-TCAGGGCG"], BuildOpts(k=3))
    codes = encode_ascii(b"CAAGCCACTCATTGGGTC")
    ms, ivals = query_ms_device(sbwt, codes)
    assert ms.tolist() == [1, 2, 2, 3, 2, 2, 3, 2, 1, 2, 3, 1, 1, 1, 2, 3, 1, 2]
    ms_ref, iv_ref = query_ms_codes(sbwt, codes)
    np.testing.assert_array_equal(ms, ms_ref)
    np.testing.assert_array_equal(ivals, iv_ref)


@pytest.mark.parametrize("k", [3, 7, 31, 63])
def test_differential_random(k):
    rng = np.random.default_rng(k)
    ref = BASES[rng.integers(0, 4, 400)].tobytes()
    # mutated + partially unrelated query, with some Ns sprinkled in
    q = bytearray(BASES[rng.integers(0, 4, 300)].tobytes())
    q[50:150] = ref[100:200]
    q[200:260] = ref[30:90]
    for p in rng.integers(0, 300, 5):
        q[p : p + 1] = b"N"
    query = bytes(q)

    sbwt = build([ref], BuildOpts(k=k))
    codes = encode_ascii(query)
    ms_ref, iv_ref = query_ms_codes(sbwt, codes)
    ms_dev, iv_dev = query_ms_device(sbwt, codes)
    np.testing.assert_array_equal(ms_dev, ms_ref)
    np.testing.assert_array_equal(iv_dev, iv_ref)


def test_values_fast_path_parity():
    """The 2-bit value-only join agrees with the full 3-bit join + oracle."""
    rng = np.random.default_rng(0)
    ref = BASES[rng.integers(0, 4, 500)].tobytes()
    query = bytearray(BASES[rng.integers(0, 4, 700)].tobytes())
    query[100:220] = ref[40:160]
    query[400:420] = b"N" * 20
    query[600:650] = ref[0:50]  # overlaps dummy-row territory
    query = bytes(query)
    for k in (7, 15, 31, 63):
        sbwt = build([ref], BuildOpts(k=k))
        codes = encode_ascii(query)
        ms_ref, _ = query_ms_codes(sbwt, codes)
        ms2 = query_ms_values_device(sbwt, codes)
        np.testing.assert_array_equal(ms2, ms_ref)


@pytest.mark.parametrize("k", [3, 7, 31, 33])
def test_sparse_windows_intervals(k):
    """The 2-bit sparse window join (ms + full-row intervals with dummy
    adjustment) agrees with the oracle at every position, including near
    segment starts where dummy-row matches and interval ranks matter."""
    from kbo_tpu.engine import compute_ms_intervals_at

    rng = np.random.default_rng(37 + k)
    # multi-segment reference (embedded 'N' splits) -> many dummy rows
    ref = bytearray(BASES[rng.integers(0, 4, 300)].tobytes())
    ref[60:62] = b"NN"
    ref[150] = ord("N")
    ref = bytes(ref)
    q = bytearray(BASES[rng.integers(0, 4, 200)].tobytes())
    q[5:45] = ref[0:40]      # overlaps a segment start (dummy territory)
    q[80:120] = ref[62:102]  # overlaps the post-N segment start
    q[160:170] = b"N" * 10
    q = bytes(q)

    sbwt = build([ref], BuildOpts(k=k))
    codes = encode_ascii(q)
    ms_ref, iv_ref = query_ms_codes(sbwt, codes)
    positions = np.arange(len(q))
    ms_sp, iv_sp = compute_ms_intervals_at(sbwt, codes, positions)
    np.testing.assert_array_equal(ms_sp, ms_ref)
    np.testing.assert_array_equal(iv_sp, iv_ref)


@pytest.mark.parametrize("k", [16, 17, 32, 33, 64])
def test_word_boundary_k(k):
    """k at packing word boundaries (16 chars per 2-bit word, 10 per
    3-bit word) exercises the multi-word edge cases of every join path."""
    from kbo_tpu.engine import compute_ms_intervals_at

    rng = np.random.default_rng(900 + k)
    ref = BASES[rng.integers(0, 4, 600)].tobytes()
    q = bytearray(BASES[rng.integers(0, 4, 400)].tobytes())
    q[50:250] = ref[100:300]
    q[300] = ord("N")
    q = bytes(q)

    sbwt = build([ref], BuildOpts(k=k))
    codes = encode_ascii(q)
    ms_ref, iv_ref = query_ms_codes(sbwt, codes)
    np.testing.assert_array_equal(query_ms_values_device(sbwt, codes), ms_ref)
    ms_d, iv_d = query_ms_device(sbwt, codes)
    np.testing.assert_array_equal(ms_d, ms_ref)
    np.testing.assert_array_equal(iv_d, iv_ref)
    pos = np.arange(len(q))
    ms_s, iv_s = compute_ms_intervals_at(sbwt, codes, pos)
    np.testing.assert_array_equal(ms_s, ms_ref)
    np.testing.assert_array_equal(iv_s, iv_ref)


def test_neighbor_best_large_input_fallback(monkeypatch):
    """Inputs past the 24-bit packed-slot limit take a two-operand
    fallback join; forcing the limit down at small sizes must reproduce
    the packed path's MS values bit-exactly."""
    import numpy as np

    from kbo_tpu import BuildOpts, build
    from kbo_tpu import engine
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.kernels import ms as ms_mod

    rng = np.random.default_rng(14)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, 5000)].tobytes()
    idx = build([ref], BuildOpts(k=31))
    q = bytearray(ref[1000:2500])
    for p in rng.integers(0, len(q), 6):
        q[p] = bases[rng.integers(0, 4)]
    codes = encode_ascii(bytes(q))

    want = np.asarray(
        ms_mod.query_ms_values_device(idx, codes), dtype=np.int64
    )
    monkeypatch.setattr(ms_mod, "_PACKED_SLOT_LIMIT", 1)
    got = np.asarray(
        ms_mod.query_ms_values_device(idx, codes), dtype=np.int64
    )
    np.testing.assert_array_equal(got, want)
    from kbo_tpu.ops.ms import query_ms_codes

    np.testing.assert_array_equal(got, query_ms_codes(idx, codes)[0])
