"""Native single-core end-to-end map (csrc/kbo_refine.cpp) parity.

The native path is the measured single-core denominator for bench.py's
end-to-end metric; it must produce byte-identical `map` output to the
(parity-pinned) Python/device pipeline, including its inner index
construction (reference: src/lib.rs:553) and both refinement layers.
"""

import numpy as np
import pytest

from kbo_tpu import BuildOpts, MapOpts, build
from kbo_tpu import api, native
from kbo_tpu.ops.derandomize import random_match_threshold

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _pair(seed, n, snp_every=1100, indels=True):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, n)].tobytes()
    q = bytearray(ref)
    for pos in range(700, n - 700, snp_every):
        q[pos] = bases[(bases.tolist().index(q[pos]) + 1) % 4]
    if indels:
        del q[n // 3 : n // 3 + 3]
        q[2 * n // 3 : 2 * n // 3] = b"GGA"
    return ref, bytes(q)


@pytest.mark.parametrize("k,seed", [(51, 3), (31, 7), (63, 11)])
def test_native_map_e2e_parity(k, seed):
    ref, query = _pair(seed, 40000)
    sbwt = build([query], BuildOpts(k=k, build_select=True))
    thr = random_match_threshold(k, sbwt.n_kmers, 4, 1e-7)
    out_native, _ = native.map_e2e(sbwt, ref, thr, 1e-7)
    mo = MapOpts()
    mo.sbwt_build_opts = BuildOpts(k=k, build_select=True)
    out_py = api._map_batch_dense([ref], sbwt, mo)[0]
    assert out_native == out_py


def test_native_build_matches_python():
    """C++ construction emits the same rank structure as the numpy build."""
    from kbo_tpu.index.build import build_index_from_segments
    from kbo_tpu.index.encode import encode_ascii, split_segments

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bytearray(bases[rng.integers(0, 4, 5000)].tobytes())
    seq[1200:1203] = b"NNN"  # segment break
    codes = encode_ascii(bytes(seq))
    for k in (15, 31, 51, 63):
        py = build_index_from_segments(split_segments(codes), k)
        nat = native.build_arrays(codes, k)
        assert nat["n_rows"] == py.n_rows
        assert np.array_equal(nat["C"], py.C)
        assert np.array_equal(nat["lcs"], py.lcs)
        assert np.array_equal(nat["bits"].reshape(4, -1), py.bits)
        assert np.array_equal(nat["cum"].reshape(4, -1), py.cum)
