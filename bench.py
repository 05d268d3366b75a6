#!/usr/bin/env python
"""kbo-tpu benchmark: map-core throughput on the default JAX device.

Workload: the dominant device stage of `kbo map` -- streaming a mutated
genome against a query SBWT index: matching statistics + colex intervals +
derandomize + translate, fused on device (the sort-join engine,
kbo_tpu/kernels/ms.py). Baseline: the native single-core streaming engine
(csrc/kbo_cpu.cpp), which implements the reference's sequential
extend/contract algorithm over the same stages (the reference publishes no
numbers; BASELINE.md mandates a measured single-core denominator).

Timing is honest end-to-end device time: every repetition reduces the
outputs to a scalar checksum on device and fetches it, which forces the
remote execution to finish (block_until_ready alone does NOT synchronize
through the axon relay). The scalar-fetch round trip is measured separately
and subtracted. Output parity vs the native engine is verified on-device
(the relay makes bulk device->host fetches pathologically slow; a real TPU
host has no such relay).

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

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from kbo_tpu import BuildOpts, build
    from kbo_tpu.engine import device_index
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.kernels.ms import (
        INVALID,
        intervals3_windows_core,
        make_flat_buffer,
        ms2_core,
    )
    from kbo_tpu.kernels.postprocess import derandomize_core, translate_core
    from kbo_tpu.ops.derandomize import random_match_threshold

    t0 = time.time()
    index = build([query], BuildOpts(k=k))
    build_s = time.time() - t0
    threshold = random_match_threshold(k, index.n_kmers, 4, 1e-7)
    codes = encode_ascii(streamed)

    # native single-core baseline FIRST, before any device compiles spawn
    # background XLA threads that contend for the CPU (best of 2 runs)
    from kbo_tpu import native

    base_bps = None
    chars_b = None
    if native.available():
        base_s = float("inf")
        for _ in range(2):
            t0 = time.time()
            ms_b, _ = native.ms_stream(index, codes)
            d_b = native.derandomize(ms_b.astype(np.int32), k, threshold)
            chars_b = native.translate(d_b, k, threshold)
            base_s = min(base_s, time.time() - t0)
        base_bps = n / base_s
        ms_host = ms_b
    else:  # pragma: no cover - fallback when no native toolchain
        ms_host = np.zeros(n, dtype=np.int64)

    dev = device_index(index)
    platform = jax.devices()[0].platform
    buf_np, L = make_flat_buffer(codes, k)
    buf = jax.device_put(jnp.asarray(buf_np))
    thr = jnp.int32(threshold)
    Lj = jnp.int32(L)

    # scalar-fetch round-trip baseline
    tiny = jax.jit(lambda x: jnp.sum(x))
    _ = int(tiny(jnp.arange(128)))
    t0 = time.time()
    for _ in range(5):
        _ = int(tiny(jnp.arange(128)))
    rtt = (time.time() - t0) / 5

    def run_find(keys2, cap2, buf, true_len, threshold):
        ms = ms2_core(keys2, cap2, buf, k)
        derand = derandomize_core(ms, k, threshold, true_len + (k - 1))
        chars = translate_core(derand, k, threshold, true_len + (k - 1))
        return jnp.sum(chars.astype(jnp.int32)) + jnp.sum(ms), chars

    def run_map(keys2, cap2, keys3, buf, windows, win_ms, true_len, threshold):
        # the restructured map path: full-length value sweep + sparse
        # interval-rank pass at the variant/gap candidate windows (MS values
        # at the windows come from the sweep, never recomputed)
        cs_find, chars = run_find(keys2, cap2, buf, true_len, threshold)
        l, r = intervals3_windows_core(keys3, windows, win_ms, k)
        return cs_find + jnp.sum(l) + jnp.sum(r), chars

    map_fn = jax.jit(run_map)
    find_fn = jax.jit(run_find)

    # real candidate positions for the sparse interval pass: anchor windows
    # (i, i+k] of every MS drop site, as the variant caller requests them
    d = threshold
    drops = np.flatnonzero(
        (ms_host[1:] < ms_host[:-1]) & (ms_host[:-1] >= d) & (ms_host[1:] < d)
    ) + 1
    cand = np.unique((drops[:, None] + np.arange(1, k + 1)[None, :]).reshape(-1))
    cand = cand[cand < n]
    padded = np.full(n + k - 1, INVALID, dtype=np.uint8)
    padded[k - 1 :] = codes
    windows_np = padded[cand[:, None] + np.arange(k)[None, :]]
    Pb = 64
    while Pb < windows_np.shape[0]:
        Pb <<= 1
    win_ms_np = np.zeros(Pb, dtype=np.int32)
    win_ms_np[: cand.size] = ms_host[cand]
    windows_np = np.concatenate(
        [windows_np, np.full((Pb - windows_np.shape[0], k), INVALID, np.uint8)]
    )
    windows = jax.device_put(jnp.asarray(windows_np))
    win_ms = jax.device_put(jnp.asarray(win_ms_np))

    def timeit(fn, args):
        t0 = time.time()
        cs, _ = fn(*args)
        cs = int(cs)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            cs = int(fn(*args)[0])
        dt = (time.time() - t0) / reps - rtt
        return compile_s, max(dt, 1e-9), cs

    map_args = (
        dev.keys2, dev.cap2, dev.keys3, buf, windows, win_ms, Lj, thr
    )
    find_args = (dev.keys2, dev.cap2, buf, Lj, thr)
    map_compile, map_s, _ = timeit(map_fn, map_args)
    find_compile, find_s, _ = timeit(find_fn, find_args)
    map_bps = n / map_s
    find_bps = n / find_s

    # batch-serving metric: 512 x 4k read-length queries, one fused batch
    from kbo_tpu.pipeline import matches_pipeline_core, pad_batch

    QN, QL = 512, 4096
    q_list = []
    for i in range(QN):
        s0 = (i * 3901) % (n - QL)
        q = bytearray(streamed[s0 : s0 + QL])
        q_list.append(np.frombuffer(bytes(q), dtype=np.uint8))
    from kbo_tpu.index.encode import encode_ascii as _enc

    codes_b, lengths_b = pad_batch([_enc(bytes(q)) for q in q_list])

    def run_batch(keys2, cap2, codes, lengths, threshold):
        chars, ms = matches_pipeline_core(
            keys2, cap2, codes, lengths, k, threshold
        )
        return jnp.sum(chars.astype(jnp.int32)) + jnp.sum(ms), chars

    batch_fn = jax.jit(run_batch)
    batch_args = (
        dev.keys2, dev.cap2,
        jnp.asarray(codes_b), jnp.asarray(lengths_b), thr,
    )
    batch_compile, batch_s, _ = timeit(batch_fn, batch_args)
    batch_qps = QN / batch_s
    batch_bps = QN * QL / batch_s

    # parity check on device: upload native chars, compare, fetch count
    mism = None
    if chars_b is not None:
        _, chars_dev = map_fn(*map_args)
        chars_dev = chars_dev[k - 1 : k - 1 + L]
        mism = int(
            jnp.sum(
                (chars_dev != jnp.asarray(chars_b)).astype(jnp.int32)
            )
        )
        if mism:
            print(
                f"WARNING: device/native outputs differ at {mism} positions",
                file=sys.stderr,
            )

    result = {
        "metric": f"map-core bases/s (MS+intervals+derandomize+translate, k={k}, {platform})",
        "value": round(map_bps),
        "unit": "bases/s",
        "vs_baseline": round(map_bps / base_bps, 2) if base_bps else None,
    }
    print(
        f"# build={build_s:.1f}s rtt={rtt*1e3:.0f}ms "
        f"map: compile={map_compile:.1f}s device={map_s*1e3:.1f}ms "
        f"find: compile={find_compile:.1f}s device={find_s*1e3:.1f}ms "
        f"({find_bps/1e6:.1f} Mbases/s) "
        f"batch[{QN}x{QL}]: device={batch_s*1e3:.1f}ms "
        f"({batch_qps:,.0f} queries/s, {batch_bps/1e6:.1f} Mbases/s)"
        + (
            f" native_single_core={base_bps:,.0f} bases/s parity_mismatches={mism}"
            if base_bps
            else ""
        ),
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
