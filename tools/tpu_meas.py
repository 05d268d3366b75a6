#!/usr/bin/env python
"""Opportunistic per-step TPU measurements for short relay windows.

The axon relay flaps in minutes-long windows, so the full bench.py run
(host build ~60-90 s inside the window) often cannot finish. This runner
splits the work: the index build/load happens BEFORE the device probe
(pure host work, cached in /tmp/kbo_meas_idx.npz between runs), then one
bounded device probe decides whether to measure, and each step times ONE
narrowly-scoped configuration with best-of-N + spread.

    python tools/tpu_meas.py STEP [reps]

Steps (env configured before any jax import):
  map_default     e2e map 4.6M, production defaults
  map_fuse        + KBO_TPU_MAP_FUSE_REFINE=1 (one-dispatch refinement)
  map_singleshot  + KBO_TPU_MAP_FUSED=1 (single-shot sweep, merge-path)
  map_fuse_ss     both of the above
  map_mp0         defaults but KBO_TPU_MERGE_PATH=0 (bitonic merges)
  fb_mp1          find-core + batch 512x4096, merge-path default
  fb_mp0          find-core + batch 512x4096, KBO_TPU_MERGE_PATH=0

Appends one JSON line per run to .tpu_meas.jsonl (repo root). Exit codes:
0 measured, 3 relay down (retry later), 4 parity failure.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
OUT = os.path.join(REPO, ".tpu_meas.jsonl")
IDX_CACHE = "/tmp/kbo_meas_idx"

STEP_ENV = {
    "map_default": {},
    "map_fuse": {"KBO_TPU_MAP_FUSE_REFINE": "1"},
    "map_singleshot": {"KBO_TPU_MAP_FUSED": "1"},
    "map_fuse_ss": {"KBO_TPU_MAP_FUSE_REFINE": "1", "KBO_TPU_MAP_FUSED": "1"},
    "map_mp0": {"KBO_TPU_MERGE_PATH": "0"},
    "fb_mp1": {},
    "fb_mp0": {"KBO_TPU_MERGE_PATH": "0"},
    # all per-call-flag map configs in ONE process: an established relay
    # connection survives the flap windows, so amortize it (the flags are
    # read per call; only KBO_TPU_MERGE_PATH bakes into traces and still
    # needs its own process)
    "map_variants": {},
    # per-stage sync budget of the devref map (checksum fetch per stage)
    "stages": {},
}


def probe(timeout_s: float = 75) -> bool:
    # a fresh watcher state file is authoritative (probing again from a
    # second process contends for the relay and can kill the window)
    try:
        st = "/tmp/relay_state.txt"
        if (
            os.path.exists(st)
            and time.time() - os.path.getmtime(st) < 90
            and open(st).read().strip() == "UP"
        ):
            return True
    except OSError:
        pass
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(int(jnp.sum(jnp.arange(8))))"],
            capture_output=True, timeout=timeout_s,
        )
        return proc.returncode == 0 and b"28" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def build_or_load(n, k):
    import numpy as np

    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, n)].tobytes()
    query = bytearray(ref)
    for p in range(500, n - 500, 1000):
        query[p] = bases[rng.integers(0, 4)]
    for p in range(n // 50, n - n // 50, n // 10):
        del query[p : p + 3]
    query = bytes(query)

    from kbo_tpu import BuildOpts, build
    from kbo_tpu.index.serialize import load_index, save_index

    prefix = f"{IDX_CACHE}_{n}_{k}"
    if os.path.exists(prefix + ".kbo.npz"):
        index = load_index(prefix)
        log("index loaded from cache")
    else:
        t0 = time.time()
        index = build([query], BuildOpts(k=k, build_select=True))
        save_index(prefix, index)
        log(f"index built + cached ({time.time()-t0:.1f}s)")
    # BuildOpts on the loaded index (map asserts k equality)
    return ref, query, index


def main():
    step = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = int(float(os.environ.get("KBO_BENCH_GENOME", 4_600_000)))
    k = int(os.environ.get("KBO_BENCH_K", 51))
    os.environ.update(STEP_ENV[step])

    ref, query, index = build_or_load(n, k)  # host-only, before the probe

    if os.environ.get("KBO_MEAS_FORCE", "0") != "1" and not probe():
        log("relay DOWN; exit 3")
        raise SystemExit(3)

    import jax
    import jax.numpy as jnp

    from kbo_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from kbo_tpu import BuildOpts, MapOpts
    from kbo_tpu.ops.derandomize import random_match_threshold

    platform = jax.devices()[0].platform
    threshold = random_match_threshold(k, index.n_kmers, 4, 1e-7)
    rec = {
        "step": step, "n": n, "k": k, "platform": platform,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "env": STEP_ENV[step],
    }

    if step == "stages":
        import numpy as np

        from kbo_tpu import api, engine
        from kbo_tpu.kernels.mapsweep import (
            assemble_map_prio,
            decode_packed4_encode_device,
            fetch_delta_runs_extras,
            map_postprocess3,
            ms3_rows_sweep_chunked,
            pack_ascii_host,
        )
        from kbo_tpu.kernels.refine import (
            get_ext_table,
            prob_bound,
            resolve_variants,
            score_gaps,
            seq_keys3_tagged,
        )

        bo = BuildOpts(k=k, build_select=True)
        mo = MapOpts()
        mo.sbwt_build_opts = bo
        # one warm e2e run compiles everything (cache-hit from the
        # variants step) and gives the pipelined wall for comparison
        t0 = time.time()
        _ = api.map_(ref, index, mo)
        warm0 = time.time() - t0
        t0 = time.time()
        _ = api.map_(ref, index, mo)
        wall = time.time() - t0
        dev = engine.device_index(index)
        tiny = jax.jit(lambda x: jnp.sum(x))
        _ = int(tiny(jnp.arange(128)))
        t0 = time.time()
        for _ in range(8):
            _ = int(tiny(jnp.arange(128)))
        rtt = (time.time() - t0) / 8

        def sync(x):
            return float(jnp.sum(x.reshape(-1)[:64].astype(jnp.int32)))

        stage_t = {}

        def mark(name, t0, arr):
            _ = sync(arr)
            stage_t[name] = round(max(time.time() - t0 - rtt, 0.0), 4)

        from kbo_tpu.kernels.ms import _bucket

        ref_mat = np.zeros((1, _bucket(n)), np.uint8)
        ref_mat[0, :n] = np.frombuffer(ref, np.uint8)
        for _pass in range(2):  # pass 0 warms traces; pass 1 records
            lengths = np.asarray([n], np.int32)
            thr = jnp.int32(threshold)

            t0 = time.time()
            packed_up = pack_ascii_host(ref_mat, lengths)
            stage_t["pack_host"] = round(time.time() - t0, 4)
            t0 = time.time()
            ref_dev, codes_dev = decode_packed4_encode_device(
                jnp.asarray(packed_up[0]), jnp.asarray(packed_up[1]),
                jnp.asarray(packed_up[2]), jnp.asarray(lengths),
            )
            mark("upload_decode", t0, codes_dev)
            lengths_dev = jnp.asarray(lengths)
            chunk = 2359296
            t0 = time.time()
            ms_d, uniq_d, rows_d = ms3_rows_sweep_chunked(
                dev.keys3, dev.lcs3, codes_dev, k, chunk
            )
            mark("sweep_chunked", t0, ms_d)
            cap_d = max(256, 1 << (int(ref_mat.shape[1]) // 1024 - 1).bit_length())
            cap_g = max(256, 1 << (int(ref_mat.shape[1]) // 1536 - 1).bit_length())
            w_grid = max(k - threshold + 1, 1)
            t0 = time.time()
            chars_d, packed_d, pieces = map_postprocess3(
                ms_d, uniq_d, rows_d, lengths_dev, k, thr, cap_d, cap_g, w_grid
            )
            mark("postprocess", t0, chars_d)
            t0 = time.time()
            seq_words = seq_keys3_tagged(codes_dev, k=k)
            mark("seq_key_sort", t0, seq_words[0])
            t0 = time.time()
            vpos, vpv, nv = resolve_variants(
                dev.keys3, seq_words, codes_dev, jnp.asarray(ref_mat), ms_d,
                lengths_dev, pieces["drop_pos"], pieces["apos"],
                pieces["arow"], thr, k=k, cap_d=cap_d,
                d_lo=max(threshold - 1, 0),
            )
            mark("resolve_variants", t0, vpos)
            ext_tab = get_ext_table(dev)
            cap_ext = max(256, 4 * cap_g)
            t0 = time.time()
            gpos, gpv, nh, gc = score_gaps(
                dev.keys3, jnp.asarray(ref_mat), lengths_dev,
                pieces["gap_start"], pieces["gap_end_at"], pieces["grid"],
                thr, k=k, cap_ge=cap_g, cap_ext=cap_ext, ext_tab=ext_tab,
                bound=prob_bound(1e-7),
            )
            mark("score_gaps", t0, gpos)
            cap_r = 32768
            t0 = time.time()
            c2, rs, re_, rv = assemble_map_prio(
                chars_d, ref_dev, lengths_dev, [gpos, vpos], [gpv, vpv],
                True, cap_r,
            )
            mark("assemble", t0, rs)
            t0 = time.time()
            blk = np.asarray(
                fetch_delta_runs_extras(
                    c2, rs, re_, rv, jnp.zeros(8, jnp.int32), cap_r
                )
            )
            stage_t["fetch"] = round(time.time() - t0, 4)
        rec.update(
            warm_wall_s=round(wall, 4), first_s=round(warm0, 2),
            rtt_ms=round(rtt * 1e3, 1), stages_sync_s=stage_t,
            n_runs=int(blk[3, 0]),
        )
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        return

    if step == "map_variants":
        from kbo_tpu import api

        bo = BuildOpts(k=k, build_select=True)
        mo = MapOpts()
        mo.sbwt_build_opts = bo
        configs = [
            ("default", {}),
            ("fuse", {"KBO_TPU_MAP_FUSE_REFINE": "1"}),
            ("singleshot", {"KBO_TPU_MAP_FUSED": "1"}),
            ("fuse_ss", {"KBO_TPU_MAP_FUSE_REFINE": "1",
                         "KBO_TPU_MAP_FUSED": "1"}),
        ]
        base_out = None
        for name, env in configs:
            for kk_ in ("KBO_TPU_MAP_FUSE_REFINE", "KBO_TPU_MAP_FUSED"):
                os.environ.pop(kk_, None)
            os.environ.update(env)
            t0 = time.time()
            out0 = api.map_(ref, index, mo)
            first = time.time() - t0
            if base_out is None:
                base_out = out0
            times = []
            for _ in range(reps):
                t0 = time.time()
                out = api.map_(ref, index, mo)
                times.append(time.time() - t0)
            r2 = dict(rec)
            r2.update(
                step=f"map_{name}", first_s=round(first, 2),
                times_s=[round(t, 4) for t in times],
                best_s=round(min(times), 4),
                mbases_per_s=round(n / min(times) / 1e6, 2),
                parity_vs_default=0 if out0 == base_out else 1,
            )
            print(json.dumps(r2), flush=True)
            with open(OUT, "a") as fh:
                fh.write(json.dumps(r2) + "\n")
            log(f"{name}: first {first:.1f}s best {min(times):.3f}s")
        return

    if step.startswith("map"):
        from kbo_tpu import api

        bo = BuildOpts(k=k, build_select=True)
        mo = MapOpts()
        mo.sbwt_build_opts = bo
        t0 = time.time()
        out0 = api.map_(ref, index, mo)
        first = time.time() - t0
        log(f"first map run {first:.1f}s (incl. compiles)")
        times = []
        for _ in range(reps):
            t0 = time.time()
            out = api.map_(ref, index, mo)
            times.append(time.time() - t0)
            if out != out0:
                rec["error"] = "nondeterministic output"
                break
        # parity vs the default-path output when flags deviate
        if STEP_ENV[step]:
            for kk in STEP_ENV[step]:
                os.environ.pop(kk, None)
            base = api.map_(ref, index, mo)
            rec["parity_vs_default"] = 0 if base == out0 else 1
            for kk, vv in STEP_ENV[step].items():
                os.environ[kk] = vv
        rec.update(
            first_s=round(first, 2),
            times_s=[round(t, 4) for t in times],
            best_s=round(min(times), 4),
            mbases_per_s=round(n / min(times) / 1e6, 2),
        )
        if rec.get("parity_vs_default", 0):
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            raise SystemExit(4)
    else:  # find-core + batch serving (bench.py's secondary shapes)
        from kbo_tpu.engine import device_index
        from kbo_tpu.index.encode import encode_ascii
        from kbo_tpu.kernels.ms import make_flat_buffer, ms2_core
        from kbo_tpu.kernels.postprocess import (
            derandomize_core,
            translate_core,
        )
        from kbo_tpu.pipeline import matches_pipeline_core, pad_batch

        dev = device_index(index)
        codes = encode_ascii(ref)
        buf_np, L = make_flat_buffer(codes, k)
        buf = jax.device_put(jnp.asarray(buf_np))
        thr = jnp.int32(threshold)
        Lj = jnp.int32(L)

        tiny = jax.jit(lambda x: jnp.sum(x))
        _ = int(tiny(jnp.arange(128)))
        t0 = time.time()
        for _ in range(8):
            _ = int(tiny(jnp.arange(128)))
        rtt = (time.time() - t0) / 8

        def run_find(keys2, cap2, buf, true_len, threshold):
            ms = ms2_core(keys2, cap2, buf, k)
            derand = derandomize_core(ms, k, threshold, true_len + (k - 1))
            chars = translate_core(derand, k, threshold, true_len + (k - 1))
            return jnp.sum(chars.astype(jnp.int32)) + jnp.sum(ms)

        find_fn = jax.jit(run_find)

        def times_of(fn, args):
            _ = int(fn(*args))  # compile + warm
            ts = []
            for _ in range(reps):
                t0 = time.time()
                _ = int(fn(*args))
                ts.append(max(time.time() - t0 - rtt, 1e-9))
            return ts

        tf = times_of(find_fn, (dev.keys2, dev.cap2, buf, Lj, thr))
        QN, QL = 512, 4096
        q_list = [
            encode_ascii(ref[(i * 3901) % (n - QL) :][:QL])
            for i in range(QN)
        ]
        codes_b, lengths_b = pad_batch(q_list)

        def run_batch(keys2, cap2, codes, lengths, threshold):
            chars, ms = matches_pipeline_core(
                keys2, cap2, codes, lengths, k, threshold
            )
            return jnp.sum(chars.astype(jnp.int32)) + jnp.sum(ms)

        batch_fn = jax.jit(run_batch)
        tb = times_of(
            batch_fn,
            (dev.keys2, dev.cap2, jnp.asarray(codes_b),
             jnp.asarray(lengths_b), thr),
        )
        rec.update(
            rtt_ms=round(rtt * 1e3, 1),
            find_times_ms=[round(t * 1e3, 1) for t in tf],
            find_best_ms=round(min(tf) * 1e3, 1),
            find_mbases_per_s=round(n / min(tf) / 1e6, 1),
            batch_times_ms=[round(t * 1e3, 1) for t in tb],
            batch_best_ms=round(min(tb) * 1e3, 1),
            batch_qps=round(QN / min(tb)),
        )

    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
