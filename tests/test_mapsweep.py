"""Sparse-fetch map pipeline: device compaction + delta assembly parity.

The sparse path (api._map_batch_sparse / kernels/mapsweep.py) never fetches
a dense array; these tests pin its candidate detection and end-to-end output
against the dense-fetch twin and the host formulations.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kbo_tpu import BuildOpts, MapOpts, build
from kbo_tpu import api
from kbo_tpu.refine.gap_filling import _gap_runs


def _planted_pair(seed=3, n=20000):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, n)].tobytes()
    q = bytearray(ref)
    for pos in range(700, n - 700, 1100):
        q[pos] = bases[(bases.tolist().index(q[pos]) + 1) % 4]
    del q[9100:9103]
    q[14000:14000] = b"GGA"
    return ref, bytes(q)


@pytest.fixture(scope="module")
def planted_index():
    ref, query = _planted_pair()
    opts = BuildOpts(k=51, build_select=True)
    return ref, build([query], opts), opts


@pytest.mark.parametrize("fmt", [True, False])
@pytest.mark.parametrize("fill,callv", [(True, True), (False, True), (True, False)])
def test_sparse_matches_dense(planted_index, fmt, fill, callv):
    ref, sbwt, bopts = planted_index
    mo = MapOpts()
    mo.sbwt_build_opts = bopts
    mo.format = fmt
    mo.fill_gaps = fill
    mo.call_variants = callv
    assert api._map_batch_sparse([ref], sbwt, mo) == api._map_batch_dense(
        [ref], sbwt, mo
    )


def test_sparse_matches_dense_multi_contig(planted_index):
    ref, sbwt, bopts = planted_index
    mo = MapOpts()
    mo.sbwt_build_opts = bopts
    refs = [ref[:8000], ref[8000:15000], ref[15000:]]
    assert api._map_batch_sparse(refs, sbwt, mo) == api._map_batch_dense(
        refs, sbwt, mo
    )


def test_gap_run_compaction_matches_host():
    """Device gap-run start/end detection == the host _gap_runs scan,
    across randomized translations covering X runs, dash runs, and mixes."""
    from kbo_tpu.kernels.mapsweep import map_sweep_compact_core  # noqa: F401
    from kbo_tpu.kernels.mapsweep import _compact_row, _next_nondash

    rng = np.random.default_rng(0)
    for trial in range(40):
        n = int(rng.integers(30, 400))
        t = int(rng.integers(1, 8))
        chars = rng.choice(list("MX-R"), size=n, p=[0.55, 0.15, 0.25, 0.05])
        translation = list(chars)
        expected = _gap_runs(translation, t)

        arr = np.frombuffer("".join(translation).encode(), dtype=np.uint8)
        idx = jnp.arange(n, dtype=jnp.int32)
        is_dash = jnp.asarray(arr == ord("-"))
        is_x = jnp.asarray(arr == ord("X"))
        is_gapc = is_dash | is_x
        lo, hi = t, n - t - 1
        prev_gapc = jnp.concatenate([jnp.zeros((1,), bool), is_gapc[:-1]])
        start_mask = (
            is_gapc
            & (idx >= lo)
            & (idx < hi)
            & (is_x | (idx == lo) | ~prev_gapc)
        )
        starts = np.asarray(_compact_row(start_mask, idx))
        cnt = int(np.asarray(jnp.sum(start_mask)))
        nnd = np.asarray(_next_nondash(is_dash, idx, jnp.int32(n)))
        got = [(int(s), int(nnd[s])) for s in starts[:cnt]]
        assert got == expected, f"trial {trial} t={t}: {got} != {expected}"


def test_delta_run_reconstruction():
    """assemble_map's run-length deltas reconstruct the exact output,
    including long uncovered '-' stretches and isolated edits."""
    from kbo_tpu.kernels.mapsweep import assemble_map, fetch_delta_runs

    rng = np.random.default_rng(1)
    Q, L = 2, 512
    chars = np.full((Q, L), ord("M"), dtype=np.uint8)
    lengths = np.array([L, L - 37], dtype=np.int32)
    ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(Q, L))
    # a long dash stretch, scattered Xs, an R pair
    chars[0, 100:300] = ord("-")
    chars[0, 5] = ord("X")
    chars[1, 50:52] = ord("R")
    chars[1, 400:470] = ord("X")
    patches = [(0 * L + 150, ord("A")), (1 * L + 401, ord("G"))]
    pp = np.array([p for p, _ in patches], dtype=np.int32)
    pv = np.array([v for _, v in patches], dtype=np.uint8)

    counts, rs, re_, rv = assemble_map(
        jnp.asarray(chars), jnp.asarray(ref), jnp.asarray(lengths),
        jnp.asarray(pp), jnp.asarray(pv), True,
    )
    delta = np.asarray(fetch_delta_runs(counts, rs, re_, rv, 256))
    n_runs = int(delta[3, 0])
    assert n_runs <= 256

    # host expectation: apply patches then relative_to_ref per row
    from kbo_tpu.ops.format import relative_to_ref

    flat = chars.reshape(-1).copy()
    flat[pp] = pv
    want = []
    for q in range(Q):
        n = int(lengths[q])
        aln = flat[q * L : q * L + n]
        want.append(relative_to_ref(ref[q, :n].tobytes(), aln))

    got = [bytearray(ref[q, : int(lengths[q])].tobytes()) for q in range(Q)]
    for j in range(n_runs):
        s, e, v = int(delta[0, j]), int(delta[1, j]), int(delta[2, j])
        q = s // L
        e_local = min(e - q * L, len(got[q]))
        got[q][s - q * L : e_local] = bytes([v]) * (e_local - (s - q * L))
    assert [bytes(g) for g in got] == want


def test_classic_and_fused_map_paths_identical(monkeypatch):
    """The size gate (api._map_batch_sparse) switches between the fused
    3-bit sweep and the classic 2-bit sweep + interval-prefetch flow;
    both must produce byte-identical map output."""
    import numpy as np

    from kbo_tpu import BuildOpts, MapOpts, build
    from kbo_tpu.api import map_batch

    rng = np.random.default_rng(21)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bytearray(bases[rng.integers(0, 4, 30_000)].tobytes())
    query = bytearray(ref)
    for p in range(1_000, 29_000, 2_000):
        query[p] = bases[rng.integers(0, 4)]
    del query[15_000:15_003]
    bo = BuildOpts(k=51, build_select=True)
    idx = build([bytes(query)], bo)
    opts = MapOpts(sbwt_build_opts=bo)

    monkeypatch.setenv("KBO_TPU_MAP_FUSED", "1")
    fused = map_batch([bytes(ref)], idx, opts)
    monkeypatch.setenv("KBO_TPU_MAP_FUSED", "0")
    classic = map_batch([bytes(ref)], idx, opts)
    assert fused == classic
    monkeypatch.delenv("KBO_TPU_MAP_FUSED")
    monkeypatch.setenv("KBO_TPU_MAP_DENSE", "1")
    dense = map_batch([bytes(ref)], idx, opts)
    assert dense == fused


def test_classic_map_path_short_reference(monkeypatch):
    """Regression: the classic path's packed candidate fetch must pad
    short references up to the slot capacity -- before the fix, gap runs
    parsed as BIG-sentinel garbage and gaps were silently never filled."""
    import numpy as np

    from kbo_tpu import BuildOpts, MapOpts, build
    from kbo_tpu.api import map_batch

    rng = np.random.default_rng(8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bytearray(bases[rng.integers(0, 4, 200)].tobytes())
    query = bytearray(ref)
    del query[100:103]  # 3-base deletion -> a gap run the paint must keep
    bo = BuildOpts(k=31, build_select=True)
    idx = build([bytes(query)], bo)
    opts = MapOpts(sbwt_build_opts=bo)

    monkeypatch.setenv("KBO_TPU_MAP_FUSED", "0")
    classic = map_batch([bytes(ref)], idx, opts)
    monkeypatch.setenv("KBO_TPU_MAP_FUSED", "1")
    fused = map_batch([bytes(ref)], idx, opts)
    assert classic == fused
