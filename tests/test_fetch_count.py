"""Device->host round-trip budget for the map pipeline.

The axon relay costs ~30ms per fetch, so e2e map speed is set by the
NUMBER of device->host materializations, not device FLOPs (the round-1
fill_gaps once made 746 per-gap fetches). This test pins the steady-state
budget: a warm `map_` call may materialize at most 4 jax arrays. CPU
timings would never catch a regression here -- the count is the contract.
"""

import numpy as np
import pytest

import jax

from kbo_tpu import BuildOpts, MapOpts, build, map_


# the fetch_counter fixture lives in conftest.py (shared with the
# refinement stress tests)


def test_map_steady_state_fetch_budget(fetch_counter):
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n = 120_000
    ref = bases[rng.integers(0, 4, n)].tobytes()
    q = bytearray(ref)
    for p in range(500, n - 500, 1000):
        q[p] = bases[rng.integers(0, 4)]
    del q[n // 2 : n // 2 + 3]
    bo = BuildOpts(k=51, build_select=True)
    idx = build([bytes(q)], bo)
    mo = MapOpts(sbwt_build_opts=bo)

    out = map_(ref, idx, mo)  # warm: compiles + capacity discovery
    fetch_counter.clear()
    out2 = map_(ref, idx, mo)
    assert out2 == out
    n_fetches = len(fetch_counter)
    total_kb = sum(
        int(np.prod(s)) * np.dtype(d).itemsize for s, d in fetch_counter
    ) / 1e3
    # round-3 budget: the on-device refinement (kernels/refine.py)
    # resolves variants and scores gaps on device, so the steady-state
    # map pays ONE fetch (delta runs + counters ride together)
    assert n_fetches <= 1, (
        f"steady-state map_ made {n_fetches} device fetches "
        f"({total_kb:.0f} KB): {fetch_counter}"
    )
