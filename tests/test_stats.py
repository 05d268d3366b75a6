"""Observability: run statistics counters and stage timers."""

import numpy as np

from kbo_tpu import BuildOpts, CallOpts, MapOpts, build, call, map_
from kbo_tpu.utils.stats import get_stats, reset_stats, stage


def test_stage_and_counters():
    reset_stats()
    with stage("demo", bases=1000):
        pass
    get_stats().add("things", 3)
    d = get_stats().as_dict()
    assert d["demo_calls"] == 1
    assert d["demo_bases"] == 1000
    assert d["things"] == 3
    assert "demo_s" in d and "demo_bases_per_s" in d


def test_pipeline_populates_stats():
    reset_stats()
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    query = bases[rng.integers(0, 4, 2000)].tobytes()
    ref = bytearray(query)
    ref[1000] = bases[(np.frombuffer(query[1000:1001], np.uint8)[0] % 4 + 1) % 4]
    ref = bytes(ref)

    opts_b = BuildOpts(k=51, build_select=True)
    sbwt_q = build([query], opts_b)
    variants = call(sbwt_q, ref, CallOpts(sbwt_build_opts=opts_b))
    map_(ref, sbwt_q, MapOpts(sbwt_build_opts=opts_b))

    d = get_stats().as_dict()
    assert d["call_bases"] >= 2000
    # the standalone call() plus map_'s refinement each count the variant;
    # map_'s on-device resolver (kernels/refine.py) reports via the same
    # stat without routing through call()
    assert d["variants_called"] == len(variants) * 2
    assert d["call_calls"] == 1
