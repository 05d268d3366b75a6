"""Native C++ engine vs Python oracles (streaming vs position-parallel MS)."""

import numpy as np
import pytest

from kbo_tpu import BuildOpts, build
from kbo_tpu import native
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.ops.derandomize import derandomize_ms_vec
from kbo_tpu.ops.ms import query_ms_codes
from kbo_tpu.ops.translate import translate_ms_vec

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def test_ms_stream_golden():
    sbwt = build([b"AAAGAACCA-TCAGGGCG"], BuildOpts(k=3))
    codes = encode_ascii(b"CAAGCCACTCATTGGGTC")
    ms, iv = native.ms_stream(sbwt, codes)
    assert ms.tolist() == [1, 2, 2, 3, 2, 2, 3, 2, 1, 2, 3, 1, 1, 1, 2, 3, 1, 2]
    ms_ref, iv_ref = query_ms_codes(sbwt, codes)
    np.testing.assert_array_equal(ms, ms_ref)
    np.testing.assert_array_equal(iv, iv_ref)


@pytest.mark.parametrize("k", [3, 9, 31, 63])
def test_ms_stream_differential(k):
    rng = np.random.default_rng(k + 1000)
    ref = BASES[rng.integers(0, 4, 600)].tobytes()
    q = bytearray(BASES[rng.integers(0, 4, 400)].tobytes())
    q[40:160] = ref[100:220]
    q[220:300] = ref[20:100]
    for p in rng.integers(0, 400, 6):
        q[p : p + 1] = b"N"
    sbwt = build([ref], BuildOpts(k=k))
    codes = encode_ascii(bytes(q))
    ms_ref, iv_ref = query_ms_codes(sbwt, codes)
    ms_nat, iv_nat = native.ms_stream(sbwt, codes)
    np.testing.assert_array_equal(ms_nat, ms_ref)
    np.testing.assert_array_equal(iv_nat, iv_ref)


def test_derandomize_translate_native():
    noisy = np.array([1, 2, 2, 3, 2, 2, 3, 2, 1, 2, 3, 1, 1, 1, 2, 3, 1, 2])
    d = native.derandomize(noisy, 3, 2)
    assert d.tolist() == derandomize_ms_vec(noisy, 3, 2).tolist()
    t = native.translate(d, 3, 2)
    assert [chr(c) for c in t] == translate_ms_vec(d, 3, 2)

    rng = np.random.default_rng(77)
    ref = BASES[rng.integers(0, 4, 800)].tobytes()
    q = bytearray(ref)
    for p in rng.integers(5, 795, 25):
        q[p] = BASES[rng.integers(0, 4)]
    sbwt = build([bytes(q)], BuildOpts(k=21))
    noisy, _ = query_ms_codes(sbwt, encode_ascii(ref))
    for thr in (2, 5, 11):
        d_py = derandomize_ms_vec(noisy, 21, thr)
        d_na = native.derandomize(noisy, 21, thr)
        np.testing.assert_array_equal(d_na, d_py)
        t_py = translate_ms_vec(d_py, 21, thr)
        t_na = native.translate(d_na, 21, thr)
        assert [chr(c) for c in t_na] == t_py
