#!/usr/bin/env python
"""Micro-benchmarks for candidate kernel optimizations (real TPU).

1. back-sort vs scatter: the sort-join returns query results to buffer
   order today with a full single-key lax.sort over the merged width M;
   a scatter out[meta] = payload is one pass.
2. binary search vs bucket-table-accelerated search over the colex rows.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from kbo_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    tiny = jax.jit(lambda x: jnp.sum(x))
    _ = int(tiny(jnp.arange(128)))
    t0 = time.time()
    for _ in range(8):
        _ = int(tiny(jnp.arange(128)))
    rtt = (time.time() - t0) / 8
    print(f"# rtt {rtt*1e3:.1f}ms", flush=True)

    def timeit(fn, *args, reps=5):
        out = fn(*args)
        _ = int(jnp.sum(out.astype(jnp.uint32) & jnp.uint32(0xFFFF))) if hasattr(out, "astype") else None
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            _ = int(jnp.sum(out.astype(jnp.uint32) & jnp.uint32(0xFFFF)))
            best = min(best, time.time() - t0)
        return best - rtt

    rng = np.random.default_rng(0)

    if os.environ.get("KBO_MB_ONLY_MERGE", "0") == "1":
        _merge_section(rng, timeit, jax, jnp)
        return

    # ---- 1. back-sort vs scatter at M = 8M (the merged width at 4.6M)
    M = 1 << 23
    # merged order: sort_key = buffer position for query slots, M for refs
    is_q = rng.random(M) < 0.57
    T = n_q = int(is_q.sum())
    meta = np.full(M, M, dtype=np.int32)
    meta[is_q] = rng.permutation(T)
    payload = rng.integers(0, 2**31, M, dtype=np.int32)
    meta_d = jnp.asarray(meta)
    pay_d = jnp.asarray(payload)

    @jax.jit
    def back_sort(meta, pay):
        back = jax.lax.sort((meta, pay), num_keys=1, is_stable=False)
        return back[1][:T]

    @jax.jit
    def back_scatter(meta, pay):
        out = jnp.zeros(T, jnp.int32)
        return out.at[meta].set(pay, mode="drop")

    t_sort = timeit(back_sort, meta_d, pay_d)
    t_scat = timeit(back_scatter, meta_d, pay_d)
    a = np.asarray(back_sort(meta_d, pay_d))
    b = np.asarray(back_scatter(meta_d, pay_d))
    # sort places ref slots (key M) after all query slots; equal where meta<T
    print(f"backsort M={M}: sort {t_sort*1e3:.1f}ms scatter {t_scat*1e3:.1f}ms "
          f"equal={np.array_equal(a, b)}", flush=True)

    # two-payload variant (rows-join shape)
    pay2 = jnp.asarray(rng.integers(0, 2**31, M, dtype=np.int64))

    @jax.jit
    def back_sort2(meta, p1, p2):
        back = jax.lax.sort((meta, p1, p2), num_keys=1, is_stable=False)
        return back[1][:T] + back[2][:T].astype(jnp.int32)

    @jax.jit
    def back_scatter2(meta, p1, p2):
        o1 = jnp.zeros(T, jnp.int32).at[meta].set(p1, mode="drop")
        o2 = jnp.zeros(T, jnp.int64).at[meta].set(p2, mode="drop")
        return o1 + o2.astype(jnp.int32)

    t_sort2 = timeit(back_sort2, meta_d, pay_d, pay2)
    t_scat2 = timeit(back_scatter2, meta_d, pay_d, pay2)
    print(f"backsort2 M={M}: sort {t_sort2*1e3:.1f}ms scatter {t_scat2*1e3:.1f}ms",
          flush=True)

    # ---- 2. lower bound: plain binary vs bucket-table-accelerated
    n = 4_700_000
    W = 6
    keys0 = np.sort(rng.integers(0, 2**30, n, dtype=np.uint32).astype(np.uint32))
    rest = [rng.integers(0, 2**30, n, dtype=np.int64).astype(np.uint32) for _ in range(W - 1)]
    keys = jnp.stack([jnp.asarray(keys0)] + [jnp.asarray(r) for r in rest])
    E = 16384
    probes = [jnp.asarray(rng.integers(0, 2**30, E, dtype=np.int64).astype(np.uint32))
              for _ in range(W)]

    from kbo_tpu.kernels.refine import _lower_bound_device

    @jax.jit
    def lb_plain(keys, *pw):
        return _lower_bound_device(keys, list(pw))

    t_lb = timeit(lb_plain, keys, *probes)
    print(f"lower_bound plain E={E}: {t_lb*1e3:.1f}ms", flush=True)

    # bucket table on the top 15 bits of word 0
    B = 15

    @jax.jit
    def build_table(k0):
        tops = (k0 >> jnp.uint32(30 - B)).astype(jnp.int32)
        # bucket_start[p] = first row with top >= p: scatter-min row index
        # at each row's own top, then a reverse cummin fills empty buckets
        tbl = jnp.full(1 << B, n, jnp.int32)
        tbl = tbl.at[tops].min(jnp.arange(n, dtype=jnp.int32))
        # reverse cummin via doubling
        x = tbl
        s = 1
        while s < (1 << B):
            x = jnp.minimum(x, jnp.concatenate(
                [x[s:], jnp.full((s,), n, jnp.int32)]))
            s <<= 1
        return x

    tbl = build_table(keys[0])
    t_tbl = timeit(lambda k: build_table(k), keys[0])
    print(f"bucket table build: {t_tbl*1e3:.1f}ms", flush=True)

    def lb_bucket_impl(keys, tbl, pw):
        n_ = keys.shape[1]
        N = pw[0].shape[0]
        top = (pw[0] >> jnp.uint32(30 - B)).astype(jnp.int32)
        lo = tbl[top]
        hi = jnp.where(top + 1 < (1 << B), tbl[jnp.minimum(top + 1, (1 << B) - 1)], n_)
        steps = 14  # max bucket ~ n/2^B * slack; exact via while semantics
        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) >> 1
            less = jnp.zeros(N, dtype=bool)
            eq = jnp.ones(N, dtype=bool)
            for w in range(len(pw)):
                tw = keys[w][jnp.minimum(mid, jnp.int32(n_ - 1))]
                less = less | (eq & (tw < pw[w]))
                eq = eq & (tw == pw[w])
            act = lo < hi
            lo = jnp.where(act & less, mid + 1, lo)
            hi = jnp.where(act & ~less, mid, hi)
            return lo, hi
        lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
        # finish any stragglers exactly
        def cond(lohi):
            lo, hi = lohi
            return jnp.any(lo < hi)
        lo, hi = jax.lax.while_loop(cond, lambda lh: body(0, lh), (lo, hi))
        return lo

    @jax.jit
    def lb_bucket(keys, tbl, *pw):
        return lb_bucket_impl(keys, tbl, list(pw))

    t_lbb = timeit(lb_bucket, keys, tbl, *probes)
    a = np.asarray(lb_plain(keys, *probes))
    b = np.asarray(lb_bucket(keys, tbl, *probes))
    print(f"lower_bound bucket E={E}: {t_lbb*1e3:.1f}ms equal={np.array_equal(a,b)}",
          flush=True)

    # ---- 3. gather volume: 51 char-gathers vs 6 word-gathers at 213k lanes
    S = 212992
    rows = jnp.asarray(rng.integers(0, n, S, dtype=np.int64).astype(np.int32))

    @jax.jit
    def gather_chars(keys, rows):
        cols = []
        for i in range(51):
            t = 51 - 1 - i
            w, j = divmod(t, 10)
            cols.append((keys[w][rows] >> jnp.uint32(27 - 3 * j)) & jnp.uint32(7))
        return jnp.stack(cols, axis=1).astype(jnp.uint8)

    @jax.jit
    def gather_words(keys, rows):
        return jnp.stack([keys[w][rows] for w in range(W)], axis=1)

    t_gc = timeit(lambda k, r: gather_chars(k, r).astype(jnp.uint32), keys, rows)
    t_gw = timeit(gather_words, keys, rows)
    print(f"gather S={S}: chars(51) {t_gc*1e3:.1f}ms words(6) {t_gw*1e3:.1f}ms",
          flush=True)

    _merge_section(rng, timeit, jax, jnp)


def _merge_section(rng, timeit, jax, jnp):
    # ---- 4. merge strategies: pow2-padded bitonic vs exact merge-path
    # vs concat+radix. find shape pads 9.4M -> 16.8M (+78%) under bitonic.
    from kbo_tpu.kernels.ms import _radix_sort
    from kbo_tpu.kernels.pallas_sort import bitonic_merge, merge_path

    for name, n_t, n_p, Wm in (("find2bit", 4_700_000, 4_718_592, 4),
                               ("sweepchunk", 4_700_000, 2_409_472, 6)):
        t_words = [jnp.asarray(np.sort(
            rng.integers(0, 2**30, n_t).astype(np.uint32)))] + [
            jnp.asarray(rng.integers(0, 2**30, n_t).astype(np.int64)
                        .astype(np.uint32)) for _ in range(Wm - 1)]
        t_pay = jnp.asarray(rng.integers(0, 2**31, n_t, dtype=np.int64)
                            .astype(np.uint32))
        p_words = [jnp.asarray(rng.integers(0, 2**30, n_p).astype(np.int64)
                               .astype(np.uint32)) for _ in range(Wm)]
        p_pay = jnp.asarray(rng.integers(0, 2**31, n_p, dtype=np.int64)
                            .astype(np.uint32))

        @jax.jit
        def via_merge(tw0, tp, pw0, pp):
            tw = list(tw0)
            pw = list(pw0)
            p_ops = _radix_sort(pw + [pp], Wm)
            merged = bitonic_merge(tw + [tp], p_ops, n_comps=Wm,
                                   slice_output=False)
            return merged[Wm]

        @jax.jit
        def via_mpath(tw0, tp, pw0, pp):
            tw = list(tw0)
            pw = list(pw0)
            p_ops = _radix_sort(pw + [pp], Wm)
            merged = merge_path(tw + [tp], p_ops, n_comps=Wm)
            return merged[Wm]

        @jax.jit
        def via_radix(tw0, tp, pw0, pp):
            sw = [jnp.concatenate([a, b]) for a, b in zip(tw0, pw0)]
            spay = jnp.concatenate([tp, pp])
            ops = _radix_sort(sw + [spay], Wm)
            return ops[Wm]

        tp2 = timeit(via_mpath, tuple(t_words), t_pay, tuple(p_words), p_pay)
        tm = timeit(via_merge, tuple(t_words), t_pay, tuple(p_words), p_pay)
        tr = timeit(via_radix, tuple(t_words), t_pay, tuple(p_words), p_pay)
        a = np.sort(np.asarray(
            via_merge(tuple(t_words), t_pay, tuple(p_words), p_pay)
        )[: n_t + n_p])
        b = np.sort(np.asarray(
            via_mpath(tuple(t_words), t_pay, tuple(p_words), p_pay)
        )[: n_t + n_p])
        print(f"merge {name} ({n_t/1e6:.1f}M+{n_p/1e6:.2f}M, W={Wm}): "
              f"bitonic {tm*1e3:.1f}ms mpath {tp2*1e3:.1f}ms "
              f"radix {tr*1e3:.1f}ms payloads_equal={np.array_equal(a, b)}",
              flush=True)


if __name__ == "__main__":
    main()
