"""Differentials for the on-device map refinement (kernels/refine.py +
refine/device_map.py): the single-fetch devref path must be byte-identical
to the packed-fetch host refinement (which is itself pinned to the host
oracle and the reference doctests elsewhere)."""

import os

import numpy as np
import pytest

from kbo_tpu import BuildOpts, MapOpts, build
from kbo_tpu import api


def _pair(n, k, seed, snp_every=700, del_every=5000, del_len=3,
          noise_block=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, n)].tobytes()
    query = bytearray(ref)
    if snp_every:
        for p in range(500, n - 500, snp_every):
            query[p] = bases[rng.integers(0, 4)]
    if del_every:
        for p in range(n // 6, n - n // 6, del_every):
            del query[p : p + del_len]
    if noise_block:
        # a low-identity stretch: long gap runs, some unfillable
        mid = n // 2
        for p in range(mid, mid + noise_block):
            query[p] = bases[rng.integers(0, 4)]
    return ref, bytes(query)


def _map_both(ref_seqs, index, mo):
    env = os.environ
    old_fused = env.get("KBO_TPU_MAP_FUSED")
    env["KBO_TPU_MAP_FUSED"] = "1"
    try:
        env["KBO_TPU_MAP_DEVREF"] = "0"
        host = api.map_batch(list(ref_seqs), index, mo)
        env["KBO_TPU_MAP_DEVREF"] = "1"
        dev = api.map_batch(list(ref_seqs), index, mo)
    finally:
        env.pop("KBO_TPU_MAP_DEVREF", None)
        if old_fused is None:
            env.pop("KBO_TPU_MAP_FUSED", None)
        else:
            env["KBO_TPU_MAP_FUSED"] = old_fused
    return host, dev


@pytest.mark.parametrize("k", [31, 51])
def test_devref_matches_host_refinement(k):
    ref, query = _pair(20_000, k, seed=11)
    bo = BuildOpts(k=k, build_select=True)
    index = build([query], bo)
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    host, dev = _map_both([ref], index, mo)
    assert host == dev


def test_devref_multi_contig():
    k = 31
    bo = BuildOpts(k=k, build_select=True)
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, 30_000)].tobytes()
    query = bytearray(genome)
    for p in range(400, len(query) - 400, 900):
        query[p] = bases[rng.integers(0, 4)]
    index = build([bytes(query)], bo)
    # contigs of varying length, incl. one so short it has flank gaps only
    refs = [genome[:9000], genome[9000:9600], genome[9600:21000],
            genome[21000:]]
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    host, dev = _map_both(refs, index, mo)
    assert host == dev


def test_devref_low_identity_triggers_host_fallback_and_matches():
    # a noisy block yields long gap runs; some candidates sit in
    # left-extension territory, exercising needs_host + re-assembly
    k = 31
    ref, query = _pair(16_384, k, seed=7, snp_every=0, del_every=0,
                       noise_block=120)
    bo = BuildOpts(k=k, build_select=True)
    index = build([query], bo)
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    host, dev = _map_both([ref], index, mo)
    assert host == dev


@pytest.mark.parametrize(
    "fill_gaps,call_variants,fmt",
    [(False, True, True), (True, False, True), (True, True, False),
     (False, False, False)],
)
def test_devref_option_combinations(fill_gaps, call_variants, fmt):
    k = 31
    ref, query = _pair(12_000, k, seed=23)
    bo = BuildOpts(k=k, build_select=True)
    index = build([query], bo)
    mo = MapOpts(fill_gaps=fill_gaps, call_variants=call_variants,
                 format=fmt)
    mo.sbwt_build_opts = bo
    host, dev = _map_both([ref], index, mo)
    assert host == dev


def test_native_pack_matches_numpy():
    """csrc/pack.cpp must reproduce the numpy pack_ascii_host output
    bit-for-bit (packed nibbles, exception order, dtypes, pow2 padding),
    including N runs, soft-masked bases, '$' and tail padding."""
    from kbo_tpu import native
    from kbo_tpu.kernels.mapsweep import pack_ascii_host

    if not native.available() or native.pack_ascii(
        np.zeros((1, 4), np.uint8), np.asarray([4], np.int32)
    ) is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    L = 8192
    mat = np.zeros((3, L), np.uint8)
    lens = np.asarray([L, 5000, 1], np.int32)
    for q in range(3):
        mat[q, : lens[q]] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, lens[q])
        ]
    mat[0, 100:140] = ord("N")
    mat[0, 200:204] = np.frombuffer(b"acgt", np.uint8)
    mat[1, 4990] = ord("$")
    mat[1, 5001] = ord("N")  # beyond the row length: not an exception
    env = os.environ
    try:
        env["KBO_TPU_NATIVE_PACK"] = "0"
        a = pack_ascii_host(mat, lens)
        env["KBO_TPU_NATIVE_PACK"] = "1"
        b = pack_ascii_host(mat, lens)
    finally:
        env.pop("KBO_TPU_NATIVE_PACK", None)
    assert a is not None and b is not None
    for x, y in zip(a, b):
        assert x.dtype == y.dtype and x.shape == y.shape
        assert np.array_equal(x, y)


@pytest.mark.parametrize("chunk", [0, 16384])
def test_seq_table_reuse_matches_standalone_sort(chunk):
    """KBO_TPU_SEQ_REUSE=1 (rk-vs-seq join against the sweep's own sorted
    query keys, kernels.ms.ms3_rows_core want_qtable) must be byte-
    identical to the standalone seq_keys3_tagged sort -- including with
    N runs in the reference (INVALID codes exercise the per-window
    caps that replace the pad-5 key semantics)."""
    k = 31
    ref, query = _pair(50_000, k, seed=13)
    ref = bytearray(ref)
    ref[30_000 : 30_011] = b"N" * 11  # windows with truncated valid runs
    ref = bytes(ref)
    bo = BuildOpts(k=k, build_select=True)
    index = build([query], bo)
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    env = os.environ
    old = {kk: env.get(kk) for kk in
           ("KBO_TPU_MAP_FUSED", "KBO_TPU_MAP_CHUNK", "KBO_TPU_SEQ_REUSE")}
    try:
        env["KBO_TPU_MAP_FUSED"] = "1"
        if chunk:
            env["KBO_TPU_MAP_CHUNK"] = str(chunk)
        env["KBO_TPU_SEQ_REUSE"] = "0"
        base = api.map_(ref, index, mo)
        env["KBO_TPU_SEQ_REUSE"] = "1"
        reuse = api.map_(ref, index, mo)
    finally:
        for kk, v in old.items():
            if v is None:
                env.pop(kk, None)
            else:
                env[kk] = v
    assert base == reuse


def test_devref_insertion_variants():
    # insertions in the query relative to ref (ref has extra bases
    # relative to the indexed query -> deletion side) and the reverse
    k = 31
    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n = 14_000
    ref = bases[rng.integers(0, 4, n)].tobytes()
    query = bytearray(ref)
    # insert 2 bases into the query every ~3000 (ref sees a deletion)
    for p in range(2500, n - 2500, 3000):
        query[p:p] = bases[rng.integers(0, 4, 2)].tobytes()
    index = build([bytes(query)], BuildOpts(k=k, build_select=True))
    mo = MapOpts()
    mo.sbwt_build_opts = BuildOpts(k=k, build_select=True)
    host, dev = _map_both([ref], index, mo)
    assert host == dev


def test_devref_overflow_retry():
    # dense variant load: more drops than the optimistic capacity so the
    # DevRefOverflow retry path runs (cap starts at max(256, L/512))
    k = 31
    rng = np.random.default_rng(29)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n = 8192
    ref = bases[rng.integers(0, 4, n)].tobytes()
    query = bytearray(ref)
    for p in range(200, n - 200, 40):  # ~200 SNPs > 256? keep density high
        query[p] = bases[rng.integers(0, 4)]
    index = build([bytes(query)], BuildOpts(k=k, build_select=True))
    mo = MapOpts()
    mo.sbwt_build_opts = BuildOpts(k=k, build_select=True)
    host, dev = _map_both([ref], index, mo)
    assert host == dev


def test_fused_refinement_single_dispatch_matches():
    # KBO_TPU_MAP_FUSE_REFINE collapses the post-sweep chain (postprocess
    # -> resolve -> score -> assemble -> packed delta) into ONE dispatch
    # (refine.device_map.map_devref_fused); output must be bit-identical
    # to the multi-dispatch devref path, incl. deletions and a dense
    # overflow-retry workload
    k = 51
    bo = BuildOpts(k=k, build_select=True)
    env = os.environ
    try:
        for seed, snp_every, del_every in ((3, 900, 6000), (9, 60, 0)):
            ref, query = _pair(24_000, k, seed=seed, snp_every=snp_every,
                               del_every=del_every)
            index = build([query], bo)
            mo = MapOpts()
            mo.sbwt_build_opts = bo
            env.pop("KBO_TPU_MAP_FUSE_REFINE", None)
            multi = api.map_batch([ref], index, mo)
            env["KBO_TPU_MAP_FUSE_REFINE"] = "1"
            fused = api.map_batch([ref], index, mo)
            assert fused == multi, (seed, snp_every, del_every)
    finally:
        env.pop("KBO_TPU_MAP_FUSE_REFINE", None)


def test_chunked_fused_sweep_matches_single_shot():
    # KBO_TPU_MAP_CHUNK forces fixed-shape sub-dispatches; outputs must
    # be bit-identical to the single-shot fused sweep (exact k-1 context)
    k = 31
    ref, query = _pair(40_000, k, seed=41)
    bo = BuildOpts(k=k, build_select=True)
    index = build([query], bo)
    mo = MapOpts()
    mo.sbwt_build_opts = bo
    env = os.environ
    env["KBO_TPU_MAP_FUSED"] = "1"
    try:
        single = api.map_batch([ref], index, mo)
        env["KBO_TPU_MAP_CHUNK"] = "8192"
        chunked = api.map_batch([ref], index, mo)
    finally:
        env.pop("KBO_TPU_MAP_CHUNK", None)
        env.pop("KBO_TPU_MAP_FUSED", None)
    assert single == chunked


def test_packed_reference_upload_roundtrip():
    # the 2-bit packed upload must reconstruct the raw [Q, L] matrix byte
    # for byte (exceptions cover every non-uppercase-ACGT in-length byte;
    # padding decodes to 0), and the device encoder must match the host
    # LUT over all 256 byte values
    import jax.numpy as jnp

    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.kernels.mapsweep import (
        decode_packed4_device,
        encode_ascii_device,
        pack_ascii_host,
    )

    rng = np.random.default_rng(11)
    pool = np.frombuffer(b"ACGTacgtN$-", dtype=np.uint8)
    Q, L = 3, 512
    lengths = np.array([512, 300, 17], dtype=np.int32)
    ref = np.zeros((Q, L), np.uint8)
    for q in range(Q):
        n = lengths[q]
        ref[q, :n] = np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, n)
        ]
        odd = rng.integers(0, n, max(1, n // 50))
        ref[q, odd] = pool[rng.integers(0, len(pool), odd.size)]
    packed = pack_ascii_host(ref, lengths)
    assert packed is not None
    dec = np.asarray(
        decode_packed4_device(
            jnp.asarray(packed[0]), jnp.asarray(packed[1]),
            jnp.asarray(packed[2]), jnp.asarray(lengths),
        )
    )
    assert (dec == ref).all()

    every = np.arange(256, dtype=np.uint8).reshape(2, 128)
    assert (
        np.asarray(encode_ascii_device(jnp.asarray(every)))
        == encode_ascii(every.reshape(-1)).reshape(2, 128)
    ).all()

    # soft-masked (dense exceptions) falls back
    soft = np.full((1, 512), ord("a"), np.uint8)
    assert pack_ascii_host(soft, np.array([512], np.int32)) is None


def test_pary_lower_bound_matches_bisect():
    # the 8-ary device lower bound must be exact across table sizes,
    # duplicate-pivot spans, below-min and above-max probes
    import bisect

    import jax.numpy as jnp

    from kbo_tpu.kernels.refine import _lower_bound_device, bucket_table

    for n in (1, 2, 8, 9, 64, 5003):
        rng = np.random.default_rng(n)
        w0 = np.sort(rng.integers(0, 2**30, n).astype(np.uint32))
        w1 = rng.integers(0, 2**30, n).astype(np.uint32)
        w1 = w1[np.lexsort((w1, w0))]
        keys = jnp.asarray(np.stack([w0, w1]))
        pi = rng.integers(0, n, 64)
        p0 = np.concatenate(
            [w0[pi], rng.integers(0, 2**30, 64).astype(np.uint32),
             np.zeros(2, np.uint32), np.full(2, 2**31, np.uint32)]
        )
        p1 = np.concatenate(
            [w1[pi], rng.integers(0, 2**30, 64).astype(np.uint32),
             np.zeros(2, np.uint32), np.full(2, 2**31, np.uint32)]
        )
        lo = np.asarray(
            _lower_bound_device(keys, [jnp.asarray(p0), jnp.asarray(p1)])
        )
        lo_t = np.asarray(
            _lower_bound_device(
                keys, [jnp.asarray(p0), jnp.asarray(p1)], bucket_table(keys)
            )
        )
        tab = list(zip(w0.tolist(), w1.tolist()))
        for i, ab in enumerate(zip(p0.tolist(), p1.tolist())):
            assert lo[i] == bisect.bisect_left(tab, ab)
            assert lo_t[i] == bisect.bisect_left(tab, ab)


def test_ext_table_matches_extension_loop():
    # the precomputed canonical-chain table must reproduce the while-loop
    # extension exactly: same chars, same lengths, for every row and any
    # budget (incl. 0, 1, k and chain-terminating rows)
    import jax.numpy as jnp

    from kbo_tpu import engine
    from kbo_tpu.kernels.refine import (
        build_ext_table,
        ext_from_table,
        left_extend_device,
        unpack_rows3,
    )

    for k, n in ((31, 4000), (13, 800)):
        ref, query = _pair(n, k, seed=31, snp_every=300, del_every=900,
                           del_len=2)
        bo = BuildOpts(k=k, build_select=True)
        index = build([query], bo)
        dev = engine.device_index(index)
        ew, el = build_ext_table(dev.keys3, k)
        rng = np.random.default_rng(5)
        rows = jnp.asarray(
            rng.integers(0, index.n_rows, 256).astype(np.int32)
        )
        budgets = jnp.asarray(
            np.concatenate(
                [np.zeros(32), np.ones(32), np.full(32, k),
                 rng.integers(0, k + 1, 160)]
            ).astype(np.int32)
        )
        kmers = unpack_rows3(dev.keys3, rows, k)
        e_loop, l_loop = left_extend_device(dev.keys3, kmers, budgets, k)
        e_tab, l_tab = ext_from_table(ew, el, rows, kmers, budgets, k)
        l_loop, l_tab = np.asarray(l_loop), np.asarray(l_tab)
        assert (l_loop == l_tab).all()
        e_loop, e_tab = np.asarray(e_loop), np.asarray(e_tab)
        # compare only the meaningful prefix (chars beyond ext_len+k are
        # clip artifacts in both formulations but not guaranteed equal)
        for i in range(rows.shape[0]):
            m = int(l_loop[i])
            assert (e_loop[i, :m] == e_tab[i, :m]).all(), i
        assert (np.asarray(el) > 0).any(), "chains must exist on this input"


def test_resolve_variants_probe_range_reduction_identity():
    # d_lo drops rk-vs-seq probe offsets whose MS values are bounded below
    # the peak threshold: the emitted patches must be identical to the
    # full-probe run for every d_lo in [0, threshold-1]
    import jax.numpy as jnp

    from kbo_tpu import engine
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.kernels.mapsweep import map_postprocess3, ms3_rows_sweep
    from kbo_tpu.kernels.refine import resolve_variants, seq_keys3_tagged
    from kbo_tpu.ops.derandomize import random_match_threshold

    # k must exceed 2*threshold + 1 for SNPs to resolve (threshold ~17 at
    # this index size) -- the reference's own calling regime
    k = 51
    ref, query = _pair(6_000, k, seed=23, snp_every=400, del_every=2500)
    bo = BuildOpts(k=k, build_select=True)
    index = build([query], bo)
    t = random_match_threshold(k, index.n_kmers, 4, 1e-7)
    dev = engine.device_index(index)
    codes = encode_ascii(ref)
    L = 8192
    codes_mat = np.full((1, L), 255, np.uint8)
    codes_mat[0, : codes.size] = codes
    ref_mat = np.zeros((1, L), np.uint8)
    ref_mat[0, : len(ref)] = np.frombuffer(ref, np.uint8)
    lengths = jnp.asarray(np.asarray([codes.size], np.int32))
    codes_dev = jnp.asarray(codes_mat)
    ms, uniq, rows = ms3_rows_sweep(dev.keys3, dev.lcs3, codes_dev, k)
    chars, packed, pieces = map_postprocess3(
        ms, uniq, rows, lengths, k, jnp.int32(t), 256, 256
    )
    seq_words = seq_keys3_tagged(codes_dev, k=k)
    outs = []
    for d_lo in (0, max(t - 1, 0)):
        pos, pv, n_var = resolve_variants(
            dev.keys3, seq_words, codes_dev, jnp.asarray(ref_mat), ms,
            lengths, pieces["drop_pos"], pieces["apos"], pieces["arow"],
            jnp.int32(t), k=k, cap_d=256, d_lo=d_lo,
        )
        outs.append((np.asarray(pos), np.asarray(pv), int(n_var)))
    assert outs[0][2] > 0, "workload must actually resolve variants"
    assert (outs[0][0] == outs[1][0]).all()
    assert (outs[0][1] == outs[1][1]).all()
    assert outs[0][2] == outs[1][2]
