#!/usr/bin/env python
"""Measure the single-shot fused 3-bit sweep at genome scale vs chunked.

Round 2 gated the single-shot path above 3M positions because XLA:TPU
compile time exploded (>20 min at 4.6M). Round 3 removed the suspected
cause (the merged-order LCS gather). This script times: cold compile and
steady state for KBO_TPU_MAP_FUSED=1 (single-shot) on the bench workload,
for comparison against the chunked numbers from tools/profile_map.py.

Usage: python tools/fused_single_shot.py [n_bases] [k]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 4_600_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 51
    # FUSED=1 alone still picks the chunked path on TPU above 3M; an
    # oversized chunk override (> L, within the slot budget) defeats the
    # use_chunked gate so the sweep runs as ONE dispatch (api.py gating)
    os.environ["KBO_TPU_MAP_FUSED"] = "1"
    os.environ["KBO_TPU_MAP_CHUNK"] = "99999999"

    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, n)].tobytes()
    query = bytearray(ref)
    for p in range(500, n - 500, 1000):
        query[p] = bases[rng.integers(0, 4)]
    for p in range(n // 50, n - n // 50, n // 10):
        del query[p : p + 3]
    query = bytes(query)

    from kbo_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from kbo_tpu import BuildOpts, MapOpts, build, api

    bo = BuildOpts(k=k, build_select=True)
    t0 = time.time()
    index = build([query], bo)
    print(f"# host build {time.time()-t0:.1f}s", flush=True)
    mo = MapOpts()
    mo.sbwt_build_opts = bo

    t0 = time.time()
    out1 = api.map_(ref, index, mo)
    print(f"# single-shot first run (incl. compile): {time.time()-t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        out = api.map_(ref, index, mo)
        best = min(best, time.time() - t0)
        assert out == out1
    print(f"# single-shot steady: {best:.3f}s ({n/best/1e6:.2f} Mbases/s)",
          flush=True)


if __name__ == "__main__":
    main()
