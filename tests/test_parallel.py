"""Multi-device parity: same batch on 1 device vs an 8-device CPU mesh must
produce bit-identical merged outputs (SURVEY §4 testing plan item c)."""

import jax
import numpy as np
import pytest

from kbo_tpu import BuildOpts, build
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.ops.derandomize import random_match_threshold
from kbo_tpu.ops.ms import query_ms_codes
from kbo_tpu.ops.derandomize import derandomize_ms_vec
from kbo_tpu.ops.translate import translate_ms_vec
from kbo_tpu.parallel.mesh import make_mesh, matches_batch_sharded
from kbo_tpu.pipeline import matches_batch

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _mk_queries(rng, ref, n, lo=50, hi=300):
    out = []
    for _ in range(n):
        L = int(rng.integers(lo, hi))
        start = int(rng.integers(0, len(ref) - L))
        q = bytearray(ref[start : start + L])
        for p in rng.integers(0, L, 3):
            q[p] = BASES[rng.integers(0, 4)]
        out.append(encode_ascii(bytes(q)))
    return out


def test_single_vs_multi_device_parity():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    rng = np.random.default_rng(5)
    ref = BASES[rng.integers(0, 4, 2000)].tobytes()
    sbwt = build([ref], BuildOpts(k=21))
    t = random_match_threshold(21, sbwt.n_kmers, 4, 1e-7)
    queries = _mk_queries(rng, ref, 13)  # deliberately not divisible by 8

    single = matches_batch(sbwt, queries, t)
    mesh8 = make_mesh(8)
    multi = matches_batch_sharded(sbwt, queries, t, mesh=mesh8)
    assert len(single) == len(multi) == 13
    for a, b in zip(single, multi):
        np.testing.assert_array_equal(a, b)


def test_index_sharded_matches_parity():
    """Prefix-sharded index placement (SURVEY §2.3 row 2's >HBM
    alternative): each device holds a colex range of the key table;
    per-shard partial MS values pmax-reduce. Must be bit-identical to the
    replicated single-device path."""
    from kbo_tpu.parallel.mesh import matches_batch_index_sharded

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(9)
    ref = BASES[rng.integers(0, 4, 3000)].tobytes()
    sbwt = build([ref], BuildOpts(k=21))
    t = random_match_threshold(21, sbwt.n_kmers, 4, 1e-7)
    queries = _mk_queries(rng, ref, 9)

    single = matches_batch(sbwt, queries, t)
    mesh8 = make_mesh(8, axis="model")
    sharded = matches_batch_index_sharded(sbwt, queries, t, mesh=mesh8)
    assert len(single) == len(sharded) == 9
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a, b)


def test_pipeline_vs_scalar_oracle():
    rng = np.random.default_rng(6)
    ref = BASES[rng.integers(0, 4, 1500)].tobytes()
    sbwt = build([ref], BuildOpts(k=15))
    t = max(2, random_match_threshold(15, sbwt.n_kmers, 4, 1e-7))
    queries = _mk_queries(rng, ref, 5)

    batched = matches_batch(sbwt, queries, t)
    for codes, chars in zip(queries, batched):
        noisy, _ = query_ms_codes(sbwt, codes)
        expected = translate_ms_vec(derandomize_ms_vec(noisy, 15, t), 15, t)
        assert [chr(c) for c in chars] == expected


def test_long_sharded_matches_single():
    """Sequence parallelism with halo is exact: sharding one long query
    over 8 devices gives identical chars + ms to the unsharded pipeline."""
    from kbo_tpu.parallel.mesh import make_mesh, matches_long_sharded

    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, 5000)].tobytes()
    streamed = bytearray(ref)
    for p in range(100, 4900, 250):  # dense SNPs: many resets near halos
        streamed[p] = bases[rng.integers(0, 4)]
    streamed[2000:2400] = bases[rng.integers(0, 4, 400)].tobytes()  # long gap
    streamed[1] = bases[rng.integers(0, 4)]  # sequence-start special case
    streamed = bytes(streamed)

    index = build([ref], BuildOpts(k=31))
    threshold = random_match_threshold(31, index.n_kmers, 4, 1e-7)
    codes = encode_ascii(streamed)

    from kbo_tpu.pipeline import matches_ms_batch

    want_chars, want_ms = matches_ms_batch(index, [codes], threshold)
    mesh = make_mesh(8)
    got_chars, got_ms = matches_long_sharded(index, codes, threshold, mesh)
    np.testing.assert_array_equal(got_ms, want_ms[0])
    np.testing.assert_array_equal(got_chars, want_chars[0])


def test_long_sharded_trailing_shard_past_end():
    """Ceil-division chunking can start trailing shards at or past the
    sequence end (possible when chunk is barely above the halo and the
    mesh is wide); those shards must contribute nothing instead of
    crashing or mis-slicing. The 32-device crash case needs its own
    process (the suite pins 8 virtual devices), so n=32 runs as a child."""
    from kbo_tpu.parallel.mesh import make_mesh, matches_long_sharded

    rng = np.random.default_rng(9)
    genome = BASES[rng.integers(0, 4, 4000)].tobytes()
    index = build([genome], BuildOpts(k=3))

    # n=8: last shard starts exactly at L (L=120: chunk=15, s_7=105; and
    # L=57: chunk=8 > halo=7, boundary-tight)
    for L in (57, 120):
        seq = genome[:L]
        codes = encode_ascii(seq)
        chars, ms = matches_long_sharded(index, codes, 2, make_mesh(8))
        noisy, _ = query_ms_codes(index, codes)
        derand = derandomize_ms_vec(noisy, 3, 2)
        want = translate_ms_vec(derand, 3, 2)
        np.testing.assert_array_equal(ms, noisy)
        assert [chr(c) for c in chars] == want

    import os
    import subprocess
    import sys
    import textwrap

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"
    child = textwrap.dedent(
        """
        import numpy as np
        from kbo_tpu import BuildOpts, build
        from kbo_tpu.index.encode import encode_ascii
        from kbo_tpu.ops.ms import query_ms_codes
        from kbo_tpu.ops.derandomize import derandomize_ms_vec
        from kbo_tpu.ops.translate import translate_ms_vec
        from kbo_tpu.parallel.mesh import make_mesh, matches_long_sharded

        rng = np.random.default_rng(9)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        genome = bases[rng.integers(0, 4, 4000)].tobytes()
        index = build([genome], BuildOpts(k=3))
        # L=240, n=32: chunk=8 > halo=7 and the last shard's window start
        # (248 - halo) lies past the end -- the pre-fix crash shape
        for L in (240, 249):
            codes = encode_ascii(genome[:L])
            chars, ms = matches_long_sharded(index, codes, 2, make_mesh(32))
            noisy, _ = query_ms_codes(index, codes)
            want = translate_ms_vec(derandomize_ms_vec(noisy, 3, 2), 3, 2)
            assert ms.tolist() == list(noisy), L
            assert [chr(c) for c in chars] == want, L
        print("OK32")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, capture_output=True,
        timeout=300, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK32" in proc.stdout


def test_find_rle_sharded_parity():
    """Device-RLE find over a mesh (api.find_batch's mesh serving path):
    the sharded segment tables must reproduce the single-device
    find_rle_batch structs exactly -- including queries torn by gaps."""
    from kbo_tpu import api
    from kbo_tpu.opts import FindOpts
    from kbo_tpu.parallel.mesh import find_rle_batch_sharded
    from kbo_tpu.pipeline import find_rle_batch

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(11)
    ref = BASES[rng.integers(0, 4, 2500)].tobytes()
    sbwt = build([ref], BuildOpts(k=21))
    t = random_match_threshold(21, sbwt.n_kmers, 4, 1e-7)
    queries = _mk_queries(rng, ref, 11)
    # one query with an unrelated insert so at least one row has >1 segment
    torn = bytearray(ref[100:400])
    torn[120:180] = BASES[rng.integers(0, 4, 60)].tobytes()
    queries.append(encode_ascii(bytes(torn)))

    single = find_rle_batch(sbwt, queries, t)
    mesh8 = make_mesh(8)
    sharded = find_rle_batch_sharded(sbwt, queries, t, mesh=mesh8)
    assert single == sharded
    assert any(len(r) > 1 for r in single)

    # an N-containing query defeats the 2-bit packed upload
    # (pipeline.pack_codes_host returns None) -- the raw-upload fallback
    # must produce the identical structs
    withn = bytearray(ref[500:900])
    withn[50:60] = b"N" * 10
    queries_n = queries + [encode_ascii(bytes(withn))]
    assert find_rle_batch(sbwt, queries_n, t) == find_rle_batch_sharded(
        sbwt, queries_n, t, mesh=mesh8
    )

    # and the api wiring: find_batch(mesh=...) takes this path
    raw = BASES[queries[0] - 1].tobytes()  # decode codes -> ASCII
    via_api = api.find_batch([raw], sbwt, FindOpts(), mesh=mesh8)
    assert via_api[0] == single[0]
