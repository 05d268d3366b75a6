"""Refinement-layer stress shapes (VERDICT r2 item 6): a 100+-contig
fragmented map batch and a ~10k-drop variant call through the sparse map
path, pinned for parity against the dense-fetch path and for the
steady-state fetch budget (the shapes that exposed the per-contig serial
loop and the O(cache) interval-cache insert)."""

import os

import numpy as np
import pytest

from kbo_tpu import BuildOpts, MapOpts, build
from kbo_tpu import api

pytestmark = pytest.mark.slow  # heavyweight stress shapes (see CLAUDE.md)
from kbo_tpu.utils.stats import get_stats, reset_stats


def _genome(n, seed):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    return bases[rng.integers(0, 4, n)].tobytes(), rng, bases


def test_fragmented_120_contig_map_parity_and_budget(fetch_counter):
    k = 31
    n = 150_000
    genome, rng, bases = _genome(n, 101)
    query = bytearray(genome)
    for p in range(500, n - 500, 800):
        query[p] = bases[rng.integers(0, 4)]
    bo = BuildOpts(k=k, build_select=True)
    index = build([bytes(query)], bo)
    # 120 contigs of uneven sizes (fragmented assembly shape)
    cuts = np.sort(rng.choice(np.arange(400, n - 400), 119, replace=False))
    refs = [
        genome[s:e]
        for s, e in zip(np.concatenate([[0], cuts]),
                        np.concatenate([cuts, [n]]))
    ]
    assert len(refs) == 120
    mo = MapOpts()
    mo.sbwt_build_opts = bo

    os.environ["KBO_TPU_MAP_DENSE"] = "1"
    try:
        dense = api.map_batch(list(refs), index, mo)
    finally:
        os.environ.pop("KBO_TPU_MAP_DENSE", None)

    sparse = api.map_batch(list(refs), index, mo)  # warm/caps discovery
    assert sparse == dense
    fetch_counter.clear()
    again = api.map_batch(list(refs), index, mo)
    assert again == dense
    # steady state: the whole 120-contig batch is ONE device fetch
    assert len(fetch_counter) <= 1, fetch_counter


def test_ten_thousand_drop_call_through_sparse_map():
    k = 31
    n = 262_144
    genome, rng, bases = _genome(n, 202)
    query = bytearray(genome)
    edits = 0
    for p in range(100, n - 100, 25):  # ~10.5k planted edits -> MS drops
        query[p] = bases[rng.integers(0, 4)]
        edits += 1
    assert edits >= 10_000
    bo = BuildOpts(k=k, build_select=True)
    index = build([bytes(query)], bo)
    mo = MapOpts()
    mo.sbwt_build_opts = bo

    reset_stats()
    os.environ["KBO_TPU_MAP_DENSE"] = "1"
    try:
        dense = api.map_batch([genome], index, mo)
    finally:
        os.environ.pop("KBO_TPU_MAP_DENSE", None)
    sparse = api.map_batch([genome], index, mo)
    assert sparse == dense
    # the drop table really was at the 10k scale (capacity retry exercised:
    # the optimistic cap at L/512 is 512 slots, well under the drop count)
    # NOTE: with edits every 25 < k, most drops never re-anchor (MS cannot
    # recover to >= threshold between edits) -- the volume is the point.
    d = get_stats().as_dict()
    assert d.get("map_sweep_bases", 0) >= 2 * n
