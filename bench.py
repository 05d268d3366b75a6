#!/usr/bin/env python
"""kbo-tpu benchmark: map-core throughput on the default JAX device.

Workload: the dominant stage of `kbo map` -- streaming a mutated genome
against a query SBWT index: matching statistics + derandomize + translate,
fused on device. Baseline: the native single-core streaming engine
(csrc/kbo_cpu.cpp), which implements the reference's sequential algorithm
(the reference publishes no numbers; BASELINE.md mandates a measured
single-core denominator).

Timing is device compute (jax.block_until_ready on device-resident outputs);
in this dev environment host<->device transfers go through a slow network
relay that a real TPU host does not have, so they are reported separately on
stderr and excluded from the metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bases/s", "vs_baseline": N}

Env knobs: KBO_BENCH_GENOME (bases, default 2e6), KBO_BENCH_K (default 31),
KBO_BENCH_REPS (default 5).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    n = int(float(os.environ.get("KBO_BENCH_GENOME", 2_000_000)))
    k = int(os.environ.get("KBO_BENCH_K", 31))
    reps = int(os.environ.get("KBO_BENCH_REPS", 5))

    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    query = bases[rng.integers(0, 4, n)].tobytes()  # the indexed side
    streamed = bytearray(query)  # the streamed side: SNP every ~1 kb
    for p in range(500, n - 500, 1000):
        streamed[p] = bases[rng.integers(0, 4)]
    streamed = bytes(streamed)

    from kbo_tpu import BuildOpts, build
    from kbo_tpu.engine import device_index
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.kernels.ms import pad_long
    from kbo_tpu.ops.derandomize import random_match_threshold
    from kbo_tpu.pipeline import long_matches_pipeline

    t0 = time.time()
    index = build([query], BuildOpts(k=k))
    build_s = time.time() - t0
    threshold = random_match_threshold(k, index.n_kmers, 4, 1e-7)
    codes = encode_ascii(streamed)

    import jax
    import jax.numpy as jnp

    dev = device_index(index)
    platform = jax.devices()[0].platform

    buf, L, block = pad_long(codes, k)
    bufj = jax.device_put(jnp.asarray(buf))
    args = (dev.table2, dev.C, dev.n_rows, bufj, jnp.int32(L), k,
            jnp.int32(threshold), block)

    # warmup / compile
    t0 = time.time()
    out = long_matches_pipeline(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # timed: device compute only
    t0 = time.time()
    for _ in range(reps):
        out = long_matches_pipeline(*args)
        jax.block_until_ready(out)
    device_s = (time.time() - t0) / reps
    device_bps = n / device_s

    # one transfer (outside the metric) for the correctness check
    t0 = time.time()
    chars = np.asarray(out[0][:L].astype(jnp.int32)).astype(np.uint8)
    fetch_s = time.time() - t0

    from kbo_tpu import native

    base_bps = None
    if native.available():
        t0 = time.time()
        ms_b, _ = native.ms_stream(index, codes)
        d_b = native.derandomize(ms_b.astype(np.int32), k, threshold)
        chars_b = native.translate(d_b, k, threshold)
        base_s = time.time() - t0
        base_bps = n / base_s
        mism = int(np.count_nonzero(chars_b != chars))
        if mism:
            print(
                f"WARNING: device/native outputs differ at {mism} positions",
                file=sys.stderr,
            )

    result = {
        "metric": f"map-core bases/s (MS+derandomize+translate, k={k}, {platform})",
        "value": round(device_bps),
        "unit": "bases/s",
        "vs_baseline": round(device_bps / base_bps, 2) if base_bps else None,
    }
    print(
        f"# build={build_s:.1f}s compile={compile_s:.1f}s "
        f"device={device_s*1e3:.1f}ms fetch={fetch_s:.2f}s"
        + (f" native_single_core={base_bps:,.0f} bases/s" if base_bps else ""),
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
