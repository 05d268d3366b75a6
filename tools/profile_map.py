#!/usr/bin/env python
"""Per-stage device timing of the end-to-end map path (bench.py workload).

Each stage is dispatched, then synced by fetching a tiny checksum; the
measured scalar RTT is subtracted (block_until_ready does not synchronize
through the axon relay). Stage timings therefore over-count overlap the
real single-fetch pipeline enjoys, but they rank the compute costs.

Usage: python tools/profile_map.py [n_bases] [k]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 4_600_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 51

    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, n)].tobytes()
    query = bytearray(ref)
    for p in range(500, n - 500, 1000):
        query[p] = bases[rng.integers(0, 4)]
    for p in range(n // 50, n - n // 50, n // 10):
        del query[p : p + 3]
    query = bytes(query)

    import jax

    from kbo_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from kbo_tpu import BuildOpts, MapOpts, build
    from kbo_tpu import engine
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.ops.derandomize import random_match_threshold
    from kbo_tpu.pipeline import pad_batch

    bo = BuildOpts(k=k, build_select=True)
    t0 = time.time()
    index = build([query], bo)
    print(f"# host build {time.time()-t0:.1f}s", flush=True)
    threshold = random_match_threshold(k, index.n_kmers, 4, 1e-7)
    dev = engine.device_index(index)

    tiny = jax.jit(lambda x: jnp.sum(x))
    _ = int(tiny(jnp.arange(128)))
    t0 = time.time()
    for _ in range(8):
        _ = int(tiny(jnp.arange(128)))
    rtt = (time.time() - t0) / 8
    print(f"# rtt {rtt*1e3:.1f}ms", flush=True)

    from kbo_tpu.kernels.mapsweep import (
        assemble_map_prio,
        decode_packed4_device,
        encode_ascii_device,
        fetch_delta_runs_extras,
        map_postprocess3,
        ms3_rows_sweep_chunked,
        pack_ascii_host,
    )
    from kbo_tpu.kernels.refine import (
        resolve_variants,
        score_gaps,
        seq_keys3_tagged,
    )

    opts = MapOpts()
    opts.sbwt_build_opts = bo
    code_list = [encode_ascii(ref)]
    codes, lengths = pad_batch(code_list, bucket=True)
    Q, L = codes.shape
    ref_mat = np.zeros((Q, L), dtype=np.uint8)
    ref_mat[0, : len(ref)] = np.frombuffer(ref, dtype=np.uint8)

    def _pow2_cap(n, lo=256):
        c = lo
        while c < n:
            c <<= 1
        return c

    cap_d = _pow2_cap(L // 1024)
    cap_g = _pow2_cap(L // 1536, lo=256)
    cap_ext = _pow2_cap(max(4 * cap_g, 32 * Q), lo=256)
    cap_r = _pow2_cap(int(L // 512 + cap_g * 2 + 64 + 256))
    w_grid = max(k - threshold + 1, 1)
    d_lo = max(threshold - 1, 0)
    print(f"# Q={Q} L={L} cap_d={cap_d} cap_g={cap_g} cap_ext={cap_ext} "
          f"w_grid={w_grid} d_lo={d_lo} t={threshold}")

    from kbo_tpu.kernels.ms import _bucket as _kbucket

    slot_budget = (1 << 24) - 1 - int(dev.keys3.shape[1])
    max_chunk = slot_budget // max(Q, 1) - (k - 1)
    target = min(2_400_000, max_chunk)
    n_chunks = max(1, -(-L // target))
    chunk = min(_kbucket(-(-L // n_chunks)), max_chunk)
    print(f"# chunk={chunk} x{n_chunks}")

    def sync_u32(x):
        return int(jnp.sum(x.astype(jnp.uint32) & jnp.uint32(0xFFFF)))

    timings = {}

    def timestage(name, fn, sync, reps=3):
        out = fn()
        _ = sync(out)  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            _ = sync(out)
            best = min(best, time.time() - t0)
        timings[name] = best - rtt
        print(f"# {name}: {best - rtt:.3f}s", flush=True)
        return out

    # stage 0: upload + decode + encode
    def up():
        packed_up = pack_ascii_host(ref_mat, lengths)
        rm = decode_packed4_device(
            jnp.asarray(packed_up[0]), jnp.asarray(packed_up[1]),
            jnp.asarray(packed_up[2]), jnp.asarray(lengths),
        )
        return rm, encode_ascii_device(rm)

    ref_mat_dev, codes_dev = timestage(
        "upload+decode", up, lambda o: sync_u32(o[1][:, :64])
    )
    lengths_dev = jnp.asarray(lengths)
    thr = jnp.int32(threshold)

    # stage 1: chunked 3-bit sweep
    sweep = timestage(
        "sweep",
        lambda: ms3_rows_sweep_chunked(dev.keys3, dev.lcs3, codes_dev, k, chunk),
        lambda o: sync_u32(o[0][:, ::4096]),
    )
    ms_dev, uniq_dev, rows_dev = sweep

    # stage 2: postprocess
    post = timestage(
        "postprocess",
        lambda: map_postprocess3(
            ms_dev, uniq_dev, rows_dev, lengths_dev, k, thr, cap_d, cap_g,
            w_grid,
        ),
        lambda o: sync_u32(o[1][:, :8]),
    )
    chars_dev, packed_dev, pieces = post

    # stage 3: tagged seq keys
    seq_words = timestage(
        "seq_keys3_tagged",
        lambda: seq_keys3_tagged(codes_dev, k=k),
        lambda o: sync_u32(o[0][::4096]),
    )

    # stage 4: resolve_variants
    rv = timestage(
        "resolve_variants",
        lambda: resolve_variants(
            dev.keys3, seq_words, codes_dev, ref_mat_dev, ms_dev,
            lengths_dev, pieces["drop_pos"], pieces["apos"], pieces["arow"],
            thr, k=k, cap_d=cap_d, d_lo=d_lo,
        ),
        lambda o: sync_u32(o[0][:, :1]) + int(o[2]),
    )
    vpos, vpv, n_var = rv

    # stage 5a: extension-chain table (one-time per index; cached)
    from kbo_tpu.kernels.refine import get_ext_table

    t0 = time.time()
    ext_tab = get_ext_table(dev)
    if ext_tab is not None:
        _ = int(jnp.sum(ext_tab[1][::4096]))
        print(f"# ext_table build (one-time): {time.time()-t0-rtt:.3f}s",
              flush=True)

    # stage 5: score_gaps
    sg = timestage(
        "score_gaps",
        lambda: score_gaps(
            dev.keys3, ref_mat_dev, lengths_dev, pieces["gap_start"],
            pieces["gap_end_at"], pieces["grid"], thr, k=k,
            cap_ge=cap_g, cap_ext=cap_ext, ext_tab=ext_tab,
        ),
        lambda o: sync_u32(o[0][:, :1]) + int(o[3][0]),
    )
    gpos, gpv, needs_host, gap_counters = sg

    # stage 6: assemble
    asm = timestage(
        "assemble",
        lambda: assemble_map_prio(
            chars_dev, ref_mat_dev, lengths_dev, [gpos, vpos], [gpv, vpv],
            True, cap_r,
        ),
        lambda o: int(o[0][0]),
    )
    counts2_dev, rs_dev, re_dev, rv_dev = asm

    # stage 7: the one fetch
    extras_dev = jnp.zeros(8, jnp.int32)

    def fetch():
        return np.asarray(
            fetch_delta_runs_extras(
                counts2_dev, rs_dev, re_dev, rv_dev, extras_dev, cap_r
            )
        )

    t0 = time.time()
    d = fetch()
    print(f"# fetch first: {time.time()-t0:.3f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        d = fetch()
        best = min(best, time.time() - t0)
    timings["fetch"] = best
    print(f"# fetch: {best:.3f}s  n_runs={int(d[3,0])}", flush=True)

    total = sum(timings.values())
    print(f"# SUM {total:.3f}s  ({n/total/1e6:.2f} Mbases/s)")
    print("# counters:", {k2: float(v) for k2, v in sorted(timings.items())})


if __name__ == "__main__":
    main()
