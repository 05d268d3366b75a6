"""Mesh-sharded map_batch / call parity (8 virtual CPU devices).

BASELINE configs[4] (batched multi-query mapping with collective merge):
the sharded sweep + sharded candidate re-runs must match the single-device
sparse path bit-exactly, in input order.
"""

import numpy as np
import pytest

from kbo_tpu import BuildOpts, CallOpts, MapOpts, build
from kbo_tpu import api
from kbo_tpu.parallel.mesh import make_mesh


def _pair(seed, n):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, n)].tobytes()
    q = bytearray(ref)
    for pos in range(700, n - 700, 900):
        q[pos] = bases[(bases.tolist().index(q[pos]) + 1) % 4]
    del q[n // 2 : n // 2 + 2]
    return ref, bytes(q)


@pytest.fixture(scope="module")
def built():
    ref, query = _pair(9, 30000)
    bo = BuildOpts(k=51, build_select=True)
    return ref, build([query], bo), bo


def test_map_batch_sharded_parity(built):
    ref, sbwt, bo = built
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    # 5 contigs over 8 devices: exercises padding rows too
    refs = [ref[:7000], ref[7000:13000], ref[13000:20000],
            ref[20000:26000], ref[26000:]]
    mesh = make_mesh()
    assert mesh.devices.size == 8
    single = api.map_batch(refs, sbwt, mo)
    sharded = api.map_batch(refs, sbwt, mo, mesh=mesh)
    assert sharded == single


def test_map_seq_sharded_parity(built):
    """ONE contig position-sharded across all 8 devices (the flagship
    single-genome workload, reference src/lib.rs:720-761): chunked 3-bit
    join + slot-sharded gap scoring + sequence-sharded rk-vs-seq join
    must be bit-identical to the single-device devref path."""
    from kbo_tpu.parallel.mesh import map_seq_sharded

    ref, sbwt, bo = built
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    mesh = make_mesh()
    assert mesh.devices.size == 8
    single = api.map_batch([ref], sbwt, mo)
    sharded = map_seq_sharded([ref], sbwt, mo, mesh=mesh)
    assert sharded == single
    # the API routes fewer-contigs-than-devices batches through this path
    routed = api.map_batch([ref], sbwt, mo, mesh=mesh)
    assert routed == single


def test_map_seq_sharded_parity_multicontig(built):
    """3 contigs < 8 devices: the position-sharded path carries several
    tagged rows at once (padding rows + per-row context chunks)."""
    from kbo_tpu.parallel.mesh import map_seq_sharded

    ref, sbwt, bo = built
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    refs = [ref[:9000], ref[9000:21000], ref[21000:]]
    mesh = make_mesh()
    single = api.map_batch(refs, sbwt, mo)
    sharded = map_seq_sharded(refs, sbwt, mo, mesh=mesh)
    assert sharded == single


def test_call_sharded_parity(built):
    ref, sbwt, bo = built
    co = CallOpts(max_error_prob=1e-7, sbwt_build_opts=bo)
    mesh = make_mesh()
    single = api.call(sbwt, ref, co)
    sharded = api.call(sbwt, ref, co, mesh=mesh)
    assert [(v.query_pos, v.query_chars, v.ref_chars) for v in sharded] == [
        (v.query_pos, v.query_chars, v.ref_chars) for v in single
    ]
    assert len(single) > 0


def test_mesh_map_devref_fast_path_engages_and_matches():
    # the contig-sharded single-fetch path must (a) actually run (not
    # silently degrade to the classic mesh sweep) and (b) match the
    # single-device output bit-exactly
    import numpy as np

    from kbo_tpu import BuildOpts, MapOpts, build
    from kbo_tpu import api
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.parallel.mesh import make_mesh
    from kbo_tpu.refine.device_map import map_devref_data_sharded
    from kbo_tpu.ops.derandomize import random_match_threshold

    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n, k = 40_000, 31
    genome = bases[rng.integers(0, 4, n)].tobytes()
    query = bytearray(genome)
    for p in range(400, n - 400, 1100):
        query[p] = bases[rng.integers(0, 4)]
    del query[20_000:20_003]
    bo = BuildOpts(k=k, build_select=True)
    index = build([bytes(query)], bo)
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    refs = [genome[i * 5000 : (i + 1) * 5000] for i in range(8)]

    single = api.map_batch(list(refs), index, mo)

    mesh = make_mesh()
    threshold = random_match_threshold(k, index.n_kmers, 4, mo.max_error_prob)
    code_list = [encode_ascii(r) for r in refs]
    fast = map_devref_data_sharded(
        list(refs), index, code_list, mo, threshold, mesh
    )
    assert fast is not None, "data-sharded devref degraded unexpectedly"
    assert fast == single

    # and through the public entry point
    via_api = api.map_batch(list(refs), index, mo, mesh=mesh)
    assert via_api == single
