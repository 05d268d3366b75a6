"""Device-built full index (kernels.ms.DeviceFullIndex) parity.

Three on-device radix sorts replace the host construction; the resulting
join tables must match the host build exactly and the full map/call/find
surface must be bit-identical when run against either index.
"""

import numpy as np
import pytest

from kbo_tpu import BuildOpts, CallOpts, FindOpts, MapOpts, build
from kbo_tpu import api


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n = 30000
    ref = bases[rng.integers(0, 4, n)].tobytes()
    q = bytearray(ref)
    for pos in range(700, n - 700, 1100):
        q[pos] = bases[(bases.tolist().index(q[pos]) + 1) % 4]
    del q[9100:9103]
    q[15000:15002] = b"NN"  # segment break inside the indexed side
    return ref, bytes(q)


@pytest.fixture(scope="module")
def indexes(pair):
    ref, query = pair
    bo = BuildOpts(k=51, build_select=True)
    return ref, build([query], bo), api.build_device([query], bo, full=True), bo


def test_tables_match_host_build(indexes):
    _, host_idx, dev_idx, _ = indexes
    assert dev_idx.n_rows == host_idx.n_rows
    assert dev_idx.n_kmers == host_idx.n_kmers
    assert np.array_equal(dev_idx.C, host_idx.C)
    k3 = np.asarray(dev_idx.keys3)[:, : dev_idx.n_rows]
    assert np.array_equal(k3, np.asarray(host_idx.keys3))


def test_access_kmers_match(indexes):
    _, host_idx, dev_idx, _ = indexes
    rows = np.array([0, 1, 5, 1000, dev_idx.n_rows - 1], dtype=np.int64)
    assert np.array_equal(
        dev_idx.access_kmers_codes(rows), host_idx.access_kmers_codes(rows)
    )


def test_map_call_find_parity(indexes):
    ref, host_idx, dev_idx, bo = indexes
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    assert api.map_(ref, host_idx, mo) == api.map_(ref, dev_idx, mo)
    co = CallOpts(max_error_prob=1e-7, sbwt_build_opts=bo)
    vh = api.call(host_idx, ref, co)
    vd = api.call(dev_idx, ref, co)
    assert [(v.query_pos, v.query_chars, v.ref_chars) for v in vh] == [
        (v.query_pos, v.query_chars, v.ref_chars) for v in vd
    ]
    assert len(vh) > 0
    fo = FindOpts(max_gap_len=5)
    assert api.find(ref, host_idx, fo) == api.find(ref, dev_idx, fo)
