"""Single-fetch map refinement orchestration.

Drives the on-device refinement kernels (kernels/refine.py) after the
fused 3-bit sweep: variant resolution, gap-fill scoring, priority-ordered
patch assembly and delta emission all stay on device, and the steady-state
`map_batch` pays ONE device->host fetch (delta runs + counters + fallback
flags ride together). The host touches candidate data only on the rare
fallback paths:

- capacity overflow (more drops/gap runs than the optimistic slots):
  the caller re-runs the postprocess + refinement at exact capacities;
- ``needs_host`` gaps (a left-extension candidate could outrank the
  device's no-extension winner) and gap runs beyond the device scoring
  capacity: scored by the exact host evaluator
  (refine.gap_filling.fill_gaps_patches), then one re-assembly.

Reference semantics: map = src/lib.rs:720-761; variant calling =
src/variant_calling.rs:249-294; gap filling = src/gap_filling.rs:444-526.
"""

from __future__ import annotations

import numpy as np

from kbo_tpu.utils.stats import get_stats, stage

_BIG = 2**31 - 1


class DevRefOverflow(Exception):
    """Candidate counts exceeded the optimistic capacities: re-run the
    postprocess + refinement stages with ``cap_d``/``cap_g`` at least the
    carried values."""

    def __init__(self, need_d: int, need_g: int):
        self.need_d = need_d
        self.need_g = need_g
        super().__init__(f"devref capacity overflow: {need_d} drops, {need_g} gaps")


def _pow2_cap(n: int, lo: int = 256) -> int:
    c = lo
    while c < n:
        c <<= 1
    return c


def _paint_runs(out_flat, starts, ends, vals, L: int, row_lens):
    """Vectorized delta-run painting onto a padded [Q*L] byte canvas.

    Runs never cross row edges (the device assembler breaks at them);
    ends are additionally clipped to each row's true length. Replaces
    the per-run Python loop (3.5k iterations ~ 40 ms at the 4.6M
    benchmark)."""
    if starts.size == 0:
        return
    q = starts.astype(np.int64) // L
    row_end = q * L + row_lens[q]
    e = np.minimum(ends.astype(np.int64), row_end)
    s = starts.astype(np.int64)
    ls = np.maximum(e - s, 0)
    tot = int(ls.sum())
    if tot == 0:
        return
    base = np.repeat(s, ls)
    offs = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(ls) - ls, ls)
    out_flat[base + offs] = np.repeat(vals.astype(np.uint8), ls)


def _canvas(ref_seqs, Q: int, L: int, fmt: bool, ref_mat=None):
    """Padded [Q*L] output canvas + per-row true lengths: rows start as
    the raw reference bytes (``format=True``) or 'M' fill."""
    row_lens = np.zeros(Q, dtype=np.int64)
    for q, r in enumerate(ref_seqs):
        row_lens[q] = len(r)
    if fmt:
        if ref_mat is not None:
            canvas = ref_mat.reshape(-1).copy()
        else:
            canvas = np.zeros(Q * L, dtype=np.uint8)
            for q, r in enumerate(ref_seqs):
                canvas[q * L : q * L + len(r)] = np.frombuffer(
                    bytes(r), dtype=np.uint8
                )
    else:
        canvas = np.full(Q * L, ord("M"), dtype=np.uint8)
    return canvas, row_lens


def map_devref_finish(
    dev,
    codes_dev,
    lengths_dev,
    ms_dev,
    chars_dev,
    pieces,
    packed_dev,
    ref_seqs,
    query_sbwt,
    code_list,
    opts,
    threshold: int,
    cap_d: int,
    cap_g: int,
    total_gap_slack: int,
    ref_mat=None,
    ref_mat_dev=None,
    seq_tables=None,
):
    """Run the device refinement + assembly and reconstruct the output.

    Returns the list of output byte strings. Raises :class:`DevRefOverflow`
    when the candidate capacities were too small (caller re-runs).
    """
    import jax.numpy as jnp

    from kbo_tpu.kernels.mapsweep import (
        assemble_map_prio,
        fetch_delta_runs_extras,
    )
    from kbo_tpu.kernels.refine import (
        resolve_variants,
        score_gaps,
        seq_keys3_tagged,
    )

    k = dev.k
    Q, L = codes_dev.shape
    if ref_mat is None:
        ref_mat = np.zeros((Q, L), dtype=np.uint8)
        for q, r in enumerate(ref_seqs):
            ref_mat[q, : len(r)] = np.frombuffer(bytes(r), dtype=np.uint8)
    if ref_mat_dev is None:
        ref_mat_dev = jnp.asarray(ref_mat)

    pos_grids: list = []
    pv_grids: list = []
    n_var_dev = jnp.int32(0)
    gap_counters_dev = jnp.zeros(3, jnp.int32)
    needs_host_dev = None
    # prefix-sharded index placement: a Sharded3Index carries its mesh and
    # the refine kernels run inside shard_map with the table's collectives
    # (parallel/mesh.py); everything else is identical. A sequence-sharded
    # holder (parallel.mesh._SeqShardedDev) instead shards gap slots and
    # the rk-vs-seq join table over its ``data`` mesh.
    model_mesh = getattr(dev, "model_mesh", None)
    seq_mesh = getattr(dev, "seq_mesh", None)
    cap_ge = cap_g  # device gap scoring covers every compacted slot
    # extension lanes scale with the TOTAL gap count across contigs:
    # measured ~2 case_b lanes per gap on SNP-dense inputs (4x headroom
    # here), and in the k < 2*threshold+1 regime every gap fill needs
    # extension with up to ~(k-2t) case_b candidates per gap. An
    # overflow flags the owning gaps to the host evaluator, so
    # undersizing costs round trips, not correctness.
    cap_ext = _pow2_cap(max(4 * cap_g, 32 * Q), lo=256)
    if opts.fill_gaps:
        from kbo_tpu.kernels.refine import prob_bound

        bound = prob_bound(opts.max_error_prob)  # traced host-f64 scalar
        if model_mesh is not None:
            from kbo_tpu.parallel.mesh import sharded_score_gaps

            gpos, gpv, needs_host_dev, gap_counters_dev = sharded_score_gaps(
                dev.keys3, ref_mat_dev, lengths_dev,
                pieces["gap_start"], pieces["gap_end_at"], pieces["grid"],
                jnp.int32(threshold), bound, k=k, cap_ge=cap_ge,
                cap_ext=cap_ext, mesh=model_mesh,
            )
        elif seq_mesh is not None:
            from kbo_tpu.kernels.refine import get_ext_table
            from kbo_tpu.parallel.mesh import seqsh_score_gaps

            ext_tab = get_ext_table(dev)
            gpos, gpv, needs_host_dev, gap_counters_dev = seqsh_score_gaps(
                dev.keys3, ref_mat_dev, lengths_dev,
                pieces["gap_start"], pieces["gap_end_at"], pieces["grid"],
                jnp.int32(threshold), bound, k=k, cap_g=cap_ge,
                cap_ext=cap_ext, mesh=seq_mesh,
                ext_w=None if ext_tab is None else ext_tab[0],
                ext_l=None if ext_tab is None else ext_tab[1],
            )
        else:
            from kbo_tpu.kernels.refine import get_ext_table

            gpos, gpv, needs_host_dev, gap_counters_dev = score_gaps(
                dev.keys3,
                ref_mat_dev,
                lengths_dev,
                pieces["gap_start"],
                pieces["gap_end_at"],
                pieces["grid"],
                jnp.int32(threshold),
                k=k,
                cap_ge=cap_ge,
                cap_ext=cap_ext,
                ext_tab=get_ext_table(dev),
                bound=bound,
            )
        pos_grids.append(gpos)
        pv_grids.append(gpv)
    if opts.call_variants:
        d_lo = max(int(threshold) - 1, 0)
        if model_mesh is not None:
            from kbo_tpu.parallel.mesh import sharded_resolve_variants

            seq_words = seq_keys3_tagged(codes_dev, k=k)
            vpos, vpv, n_var_dev = sharded_resolve_variants(
                dev.keys3, seq_words, codes_dev, ref_mat_dev, ms_dev,
                lengths_dev, pieces["drop_pos"], pieces["apos"],
                pieces["arow"], jnp.int32(threshold), k=k, cap_d=cap_d,
                mesh=model_mesh, d_lo=d_lo,
            )
        elif seq_mesh is not None:
            # the rk-vs-seq join table shards by position chunk (each
            # shard sorts only its chunk's tagged window keys)
            from kbo_tpu.parallel.mesh import seqsh_resolve_variants

            vpos, vpv, n_var_dev = seqsh_resolve_variants(
                dev.keys3, dev.ctx_chunks, codes_dev, ref_mat_dev, ms_dev,
                lengths_dev, pieces["drop_pos"], pieces["apos"],
                pieces["arow"], jnp.int32(threshold), k=k, cap_d=cap_d,
                mesh=seq_mesh, d_lo=d_lo,
            )
        else:
            seq_words = None
            if seq_tables is None:
                if getattr(opts.sbwt_build_opts, "add_revcomp", False):
                    # the inner sequence index would carry BOTH strands
                    # (reference src/lib.rs:553 reuses the BuildOpts): join
                    # rk against forward + revcomp windows
                    from kbo_tpu.kernels.refine import seq_keys3_tagged_rc

                    seq_words = seq_keys3_tagged_rc(codes_dev, k=k)
                else:
                    seq_words = seq_keys3_tagged(codes_dev, k=k)
            vpos, vpv, n_var_dev = resolve_variants(
                dev.keys3,
                seq_words,
                codes_dev,
                ref_mat_dev,
                ms_dev,
                lengths_dev,
                pieces["drop_pos"],
                pieces["apos"],
                pieces["arow"],
                jnp.int32(threshold),
                k=k,
                cap_d=cap_d,
                d_lo=d_lo,
                seq_tables=seq_tables,
            )
        pos_grids.append(vpos)
        pv_grids.append(vpv)

    # Optimistic run budget: ~1 delta run per variant site (L/1024 slots
    # cover the measured ~0.8/kb density with margin) + a quarter of the
    # gap slack + flanks; an underestimate pays one exactly-sized
    # re-assembly below, while an oversized budget pays relay downlink on
    # the ONE steady-state fetch (4 int32 rows x cap_r: 32k slots = 512 KB
    # ~= 40 ms through the relay vs 3.5k real runs at the benchmark).
    cap_r = _pow2_cap(int(L // 1024 + total_gap_slack // 4 + 256))
    counts2_dev, rs_dev, re_dev, rv_dev = assemble_map_prio(
        chars_dev, ref_mat_dev, lengths_dev, pos_grids, pv_grids,
        bool(opts.format), cap_r,
    )
    counts = pieces["counts"]
    extras_dev = jnp.concatenate(
        [
            jnp.max(counts[:, 0])[None],  # 0: max drops per contig
            jnp.max(counts[:, 1])[None],  # 1: max gap runs per contig
            (
                jnp.sum(needs_host_dev.astype(jnp.int32))[None]
                if needs_host_dev is not None
                else jnp.zeros(1, jnp.int32)
            ),  # 2: gaps needing the host evaluator
            gap_counters_dev,  # 3,4,5: gaps_seen, gaps_filled, unfilled
            n_var_dev[None],  # 6: variants resolved
            jnp.sum(pieces["clamped_gap"])[None],  # 7: clamped gap bases
        ]
    )

    # ONE fetch: delta runs + counters + fallback indicators together.
    delta = np.asarray(
        fetch_delta_runs_extras(
            counts2_dev, rs_dev, re_dev, rv_dev, extras_dev, cap_r
        )
    )
    n_runs = int(delta[3, 0])
    extras = delta[3, 2:10]
    max_d, max_g, n_need_host = int(extras[0]), int(extras[1]), int(extras[2])
    if max_d > cap_d or max_g > cap_g:
        raise DevRefOverflow(max_d, max_g)

    stats = get_stats()
    if opts.fill_gaps:
        stats.add("gaps_seen", int(extras[3]))
        stats.add("gaps_filled", int(extras[4]))
        stats.add("gap_bases_unfilled", int(extras[5]))
    else:
        stats.add("gap_bases_unfilled", int(extras[7]))
    if opts.call_variants:
        stats.add("variants_called", int(extras[6]))

    host_fallback_gaps = opts.fill_gaps and (n_need_host > 0 or max_g > cap_ge)
    if host_fallback_gaps:
        # rare path: some gaps exceeded the device extension budgets.
        # Fetch the packed candidate block + flags, score those gaps on
        # host FROM THE DEVICE GRID (no interval probes: candidate rows
        # are already resolved; the host extension walks the host index's
        # own keys), re-assemble with the extra patches, re-fetch.
        from kbo_tpu.refine import gap_filling

        need = (
            np.asarray(needs_host_dev).reshape(Q, cap_ge)
            if n_need_host
            else np.zeros((Q, cap_ge), dtype=bool)
        )
        w_grid = int(pieces["grid"].shape[-1])
        block = np.asarray(packed_dev)
        bcounts = block[:, :2]
        packed = block[:, 2:]
        grid_off = 3 * cap_d + 2 * cap_g
        extra_pos: list[np.ndarray] = []
        extra_pv: list[np.ndarray] = []
        extra_unfilled = 0
        for q, ref_seq in enumerate(ref_seqs):
            ng = int(bcounts[q, 1])
            if ng == 0:
                continue
            sel = [
                j
                for j in range(ng)
                if (j < cap_ge and need[q, j]) or j >= cap_ge
            ]
            if not sel:
                continue
            ref_seq = bytes(ref_seq)
            starts = packed[q, cap_d : cap_d + ng]
            ends = packed[q, cap_d + cap_g : cap_d + cap_g + ng]
            runs = [(int(starts[j]), int(ends[j])) for j in sel]
            grid_all = packed[q, grid_off : grid_off + cap_g * w_grid]
            grid_sel = grid_all.reshape(cap_g, w_grid)[sel]
            gp = gap_filling.fill_gaps_patches(
                runs, None, ref_seq, query_sbwt, threshold,
                opts.max_error_prob, grid=grid_sel,
            )
            clamped = sum(
                max(0, min(e, len(ref_seq) - threshold) - s)
                for s, e in runs
            )
            extra_unfilled += max(0, clamped - len(gp))
            if gp:
                pp = np.fromiter((p for p, _ in gp), dtype=np.int64)
                vv = np.fromiter((v for _, v in gp), dtype=np.int64)
                extra_pos.append((pp + q * L).astype(np.int32))
                extra_pv.append(
                    ((1 << 8) | vv).astype(np.int32)  # gap priority
                )
        stats.add("gap_bases_unfilled", extra_unfilled)
        if extra_pos:
            ep = np.concatenate(extra_pos)
            ev = np.concatenate(extra_pv)
            cap_p = _pow2_cap(ep.size, lo=64)
            ep_pad = np.full(cap_p, Q * L, dtype=np.int32)
            ev_pad = np.zeros(cap_p, dtype=np.int32)
            ep_pad[: ep.size] = ep
            ev_pad[: ev.size] = ev
            pos_grids.append(jnp.asarray(ep_pad))
            pv_grids.append(jnp.asarray(ev_pad))
            counts2_dev, rs_dev, re_dev, rv_dev = assemble_map_prio(
                chars_dev, ref_mat_dev, lengths_dev, pos_grids, pv_grids,
                bool(opts.format), cap_r,
            )
            delta = np.asarray(
                fetch_delta_runs_extras(
                    counts2_dev, rs_dev, re_dev, rv_dev, extras_dev, cap_r
                )
            )
            n_runs = int(delta[3, 0])

    if n_runs > cap_r:
        # run arrays are emitted capped, so an undersized budget re-runs
        # the (cheap) assembly at the exact size before refetching
        cap_r = _pow2_cap(n_runs)
        counts2_dev, rs_dev, re_dev, rv_dev = assemble_map_prio(
            chars_dev, ref_mat_dev, lengths_dev, pos_grids, pv_grids,
            bool(opts.format), cap_r,
        )
        delta = np.asarray(
            fetch_delta_runs_extras(
                counts2_dev, rs_dev, re_dev, rv_dev, extras_dev, cap_r
            )
        )
        n_runs = int(delta[3, 0])

    canvas, row_lens = _canvas(ref_seqs, Q, L, bool(opts.format), ref_mat)
    _paint_runs(
        canvas, delta[0, :n_runs], delta[1, :n_runs], delta[2, :n_runs],
        L, row_lens,
    )
    return [
        canvas[q * L : q * L + row_lens[q]].tobytes()
        for q in range(len(ref_seqs))
    ]


# ------------------------------------- fused single-dispatch refinement


_fused_jit = None


def _get_fused_jit():
    global _fused_jit
    if _fused_jit is None:
        import jax

        def impl(k3, co, rm, le, m_, u_, r_, th, bd, ew, el, kk, cd, cg,
                 ce, cr, dg, dv, fm, dl, wg, he, rc):
            return devref_core(
                k3, co, rm, le, m_, u_, r_, th, kk, cd, cg, ce, cr, dg,
                dv, fm, d_lo=dl, w_grid=wg,
                ext_tab=((ew, el) if he else None), bound=bd,
                rc_inner=rc,
            )

        _fused_jit = jax.jit(
            impl,
            static_argnames=(
                "kk", "cd", "cg", "ce", "cr", "dg", "dv", "fm", "dl",
                "wg", "he", "rc",
            ),
        )
    return _fused_jit


def map_devref_fused(
    dev,
    codes_dev,
    lengths_dev,
    ms_dev,
    uniq_dev,
    rows_dev,
    ref_seqs,
    opts,
    threshold: int,
    cap_d: int,
    cap_g: int,
    w_grid: int,
    ref_mat=None,
    ref_mat_dev=None,
):
    """Single-device map refinement as ONE dispatch: postprocess ->
    variant resolution -> gap scoring -> priority assembly -> packed
    delta emission (the :func:`devref_core` fusion the contig-sharded
    path already runs per shard, here at full batch size). Replaces ~6
    separate dispatches whose per-dispatch submission overhead through
    a remote TPU link (~25 ms each) dominated the map wall next to the
    sweep (BASELINE.md round-4 stage budget). np.asarray on the [4,
    cap_r] result IS the steady-state fetch.

    Returns the output byte list, or None when a gap needs the exact
    host evaluator (the caller falls back to the multi-dispatch path,
    which re-exposes the packed candidate block the host scorer needs).
    """
    import jax.numpy as jnp

    from kbo_tpu.kernels.refine import get_ext_table, prob_bound

    k = dev.k
    Q, L = codes_dev.shape
    if ref_mat is None:
        ref_mat = np.zeros((Q, L), dtype=np.uint8)
        for q, r in enumerate(ref_seqs):
            ref_mat[q, : len(r)] = np.frombuffer(bytes(r), dtype=np.uint8)
    if ref_mat_dev is None:
        ref_mat_dev = jnp.asarray(ref_mat)

    ext_tab = get_ext_table(dev) if opts.fill_gaps else None
    ew, el = (ext_tab if ext_tab is not None else (None, None))
    fn = _get_fused_jit()
    cap_r_floor = 0
    for _attempt in range(4):
        cap_ext = _pow2_cap(max(4 * cap_g, 32 * Q), lo=256)
        cap_r = max(
            _pow2_cap(int(L // 1024 + (cap_g * 2 + 64) // 4 + 256)),
            cap_r_floor,
        )
        delta4, _needs_host = fn(
            dev.keys3, codes_dev, ref_mat_dev, lengths_dev,
            ms_dev, uniq_dev, rows_dev, jnp.int32(threshold),
            prob_bound(opts.max_error_prob), ew, el,
            kk=k, cd=cap_d, cg=cap_g, ce=cap_ext, cr=cap_r,
            dg=bool(opts.fill_gaps), dv=bool(opts.call_variants),
            fm=bool(opts.format), dl=max(int(threshold) - 1, 0),
            wg=w_grid, he=ext_tab is not None,
            rc=bool(getattr(opts.sbwt_build_opts, "add_revcomp", False)),
        )
        delta = np.asarray(delta4)  # THE one steady-state fetch
        crow = delta[3]
        max_d, max_g, n_need_host = int(crow[2]), int(crow[3]), int(crow[4])
        if max_d > cap_d or max_g > cap_g:
            cap_d = max(cap_d, _pow2_cap(max_d))
            cap_g = max(cap_g, _pow2_cap(max_g))
            continue
        if opts.fill_gaps and (n_need_host > 0 or max_g > cap_g):
            return None  # exact host evaluator needed: multi-dispatch path
        n_runs = int(crow[0])
        if n_runs > cap_r:
            cap_r_floor = _pow2_cap(n_runs)
            continue
        break
    else:
        return None

    stats = get_stats()
    if opts.fill_gaps:
        stats.add("gaps_seen", int(crow[5]))
        stats.add("gaps_filled", int(crow[6]))
        stats.add("gap_bases_unfilled", int(crow[7]))
    else:
        stats.add("gap_bases_unfilled", int(crow[9]))
    if opts.call_variants:
        stats.add("variants_called", int(crow[8]))

    canvas, row_lens = _canvas(ref_seqs, Q, L, bool(opts.format), ref_mat)
    _paint_runs(
        canvas, delta[0, :n_runs], delta[1, :n_runs], delta[2, :n_runs],
        L, row_lens,
    )
    return [
        canvas[q * L : q * L + row_lens[q]].tobytes()
        for q in range(len(ref_seqs))
    ]


# ---------------------------------------- data-parallel (contig-sharded)


def devref_core(
    keys3, codes, ref_mat, lengths, ms, uniq, rows, threshold,
    k: int, cap_d: int, cap_g: int, cap_ext: int, cap_r: int,
    do_gaps: bool, do_vars: bool, fmt: bool, d_lo: int = 0,
    w_grid: int | None = None, ext_tab=None, bound=None,
    axis: str | None = None, rc_inner: bool = False,
):
    """The whole post-sweep refinement as ONE pure function over a [Q, L]
    contig block: postprocess -> variant resolution -> gap scoring ->
    priority assembly -> packed delta emission. Shard-mapped over a
    ``data`` mesh this makes the mesh map path refinement-free on the
    host (round-2's aggregate-scaling blocker was the per-contig host
    refinement loop); every stage is contig-local, so contig sharding is
    exact. Returns (delta4 [4, cap_r], needs_host [Q*cap_g] bool).

    Single-device callers keep the multi-dispatch orchestration in
    :func:`map_devref_finish` instead (XLA:TPU compile time is
    superlinear in program size; per-shard blocks here are 1/n-sized).
    """
    import jax.numpy as jnp

    from kbo_tpu.kernels.mapsweep import (
        assemble_map_prio_core,
        map_postprocess3_core,
    )
    from kbo_tpu.kernels.refine import (
        resolve_variants_core,
        score_gaps_core,
        seq_keys3_tagged_core,
    )

    chars, _packed, pieces = map_postprocess3_core(
        ms, uniq, rows, lengths, k, threshold, cap_d, cap_g, w_grid
    )
    Q, L = codes.shape
    pos_grids, pv_grids = [], []
    n_var = jnp.int32(0)
    gap_counters = jnp.zeros(3, jnp.int32)
    needs_host = jnp.zeros(Q * cap_g, dtype=bool)
    if do_gaps:
        gpos, gpv, needs_host, gap_counters = score_gaps_core(
            keys3, ref_mat, lengths, pieces["gap_start"],
            pieces["gap_end_at"], pieces["grid"], threshold,
            k, cap_g, cap_ext, axis=axis, ext_tab=ext_tab, bound=bound,
        )
        pos_grids.append(gpos)
        pv_grids.append(gpv)
    if do_vars:
        if rc_inner:
            from kbo_tpu.kernels.refine import with_revcomp_rows

            seq_words = seq_keys3_tagged_core(with_revcomp_rows(codes), k)
        else:
            seq_words = seq_keys3_tagged_core(codes, k)
        vpos, vpv, n_var = resolve_variants_core(
            keys3, seq_words, codes, ref_mat, ms, lengths,
            pieces["drop_pos"], pieces["apos"], pieces["arow"],
            threshold, k, cap_d, axis=axis, d_lo=d_lo,
        )
        pos_grids.append(vpos)
        pv_grids.append(vpv)
    counts2, rs, re, rv = assemble_map_prio_core(
        chars, ref_mat, lengths, pos_grids, pv_grids, fmt, cap_r
    )
    counts = pieces["counts"]
    extras = jnp.concatenate(
        [
            jnp.max(counts[:, 0])[None],
            jnp.max(counts[:, 1])[None],
            jnp.sum(needs_host.astype(jnp.int32))[None],
            gap_counters,
            n_var[None],
            jnp.sum(pieces["clamped_gap"]).astype(jnp.int32)[None],
        ]
    )
    n_extra = extras.shape[0]
    crow = (
        jnp.zeros(cap_r, jnp.int32)
        .at[:2]
        .set(counts2.astype(jnp.int32))
        .at[2 : 2 + n_extra]
        .set(extras.astype(jnp.int32))
    )

    def fit(row):
        row = row[:cap_r].astype(jnp.int32)
        if row.shape[0] < cap_r:
            row = jnp.pad(row, (0, cap_r - row.shape[0]))
        return row

    delta4 = jnp.stack([fit(rs), fit(re), fit(rv), crow])
    return delta4, needs_host


def _data_stage1_impl(k3, l3, co, kk: int, mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from kbo_tpu.kernels.ms import INVALID, ms3_rows_core

    def shardfn(k3s, l3s, cos):
        Qs, Ls = cos.shape
        pad = jnp.full((Qs, kk - 1), INVALID, jnp.uint8)
        buf = jnp.concatenate([pad, cos], axis=1).reshape(-1)
        stride = Ls + kk - 1
        m, u, r = ms3_rows_core(k3s, l3s, buf, kk)
        return (
            m.reshape(Qs, stride)[:, kk - 1 :],
            u.reshape(Qs, stride)[:, kk - 1 :],
            r.reshape(Qs, stride)[:, kk - 1 :],
        )

    fn = jax.shard_map(
        shardfn, mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )
    return fn(k3, l3, co)


def _data_stage2_impl(k3, co, rm, le, m_, u_, r_, th, bd, ew, el, kk: int,
                      cd: int, cg: int, ce: int, cr: int, dg: bool,
                      dv: bool, fm: bool, mesh, dl: int = 0,
                      wg: int | None = None):
    import jax
    from jax.sharding import PartitionSpec as P

    has_ext = ew is not None

    def shardfn(k3s, cos, rms, les, ms_, us, rs_, ths, bds, *ext):
        return devref_core(
            k3s, cos, rms, les, ms_, us, rs_, ths,
            kk, cd, cg, ce, cr, dg, dv, fm, d_lo=dl, w_grid=wg,
            ext_tab=(ext if has_ext else None), bound=bds,
        )

    in_specs = [
        P(), P("data"), P("data"), P("data"),
        P("data"), P("data"), P("data"), P(), P(),
    ]
    args = [k3, co, rm, le, m_, u_, r_, th, bd]
    if has_ext:
        in_specs += [P(), P()]
        args += [ew, el]
    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return fn(*args)


_data_stage1 = None
_data_stage2 = None


def _get_data_stages():
    global _data_stage1, _data_stage2
    if _data_stage1 is None:
        import functools

        import jax

        _data_stage1 = jax.jit(
            _data_stage1_impl, static_argnames=("kk", "mesh")
        )
        _data_stage2 = jax.jit(
            _data_stage2_impl,
            static_argnames=(
                "kk", "cd", "cg", "ce", "cr", "dg", "dv", "fm", "mesh",
                "dl", "wg",
            ),
        )
    return _data_stage1, _data_stage2


def map_devref_data_sharded(
    ref_seqs, query_sbwt, code_list, opts, threshold: int, mesh
):
    """Contig-sharded single-fetch map over a ``data`` mesh: the sweep AND
    the refinement run per shard on device; the host pays one gather of
    the per-shard delta blocks. Edge cases (candidate capacity overflow
    beyond the retry, extension-budget gaps) return None and the caller
    degrades to the classic mesh path -- correctness never depends on
    this fast path."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kbo_tpu import engine
    from kbo_tpu.kernels.ms import INVALID
    from kbo_tpu.pipeline import pad_batch

    k = query_sbwt.k
    dev = engine.device_index(query_sbwt)
    codes, lengths = pad_batch(code_list, bucket=True)
    nd = mesh.devices.size
    Q0 = codes.shape[0]
    Qp = ((Q0 + nd - 1) // nd) * nd
    if Qp != Q0:
        codes = np.pad(
            codes, ((0, Qp - Q0), (0, 0)), constant_values=INVALID
        )
        lengths = np.pad(lengths, (0, Qp - Q0))
    Q, L = codes.shape
    ref_mat = np.zeros((Q, L), dtype=np.uint8)
    for q, r in enumerate(ref_seqs):
        ref_mat[q, : len(r)] = np.frombuffer(bytes(r), dtype=np.uint8)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    keys3 = jax.device_put(dev.keys3, repl)
    lcs3 = jax.device_put(dev.lcs3, repl)
    codes_d = jax.device_put(jnp.asarray(codes), shard)
    ref_d = jax.device_put(jnp.asarray(ref_mat), shard)
    len_d = jax.device_put(jnp.asarray(lengths), shard)

    _stage1, _stage2 = _get_data_stages()
    ms_d, uniq_d, rows_d = _stage1(keys3, lcs3, codes_d, kk=k, mesh=mesh)

    # same capacity asymmetry as the single-device path (api.py): gap
    # slots are much more expensive to score than drop slots and much
    # rarer in practice; undersizing pays a retry, never correctness
    cap_d = _pow2_cap(L // 1024)
    cap_g = _pow2_cap(L // 1536, lo=256)
    q_per = Q // nd
    cap_r_floor = 0
    for _attempt in range(3):
        cap_ext = _pow2_cap(max(4 * cap_g, 32 * q_per), lo=256)
        # same measured-density budget as the single-device fetch (the
        # gathered [nd, 4, cap_r] block is the path's one bulk transfer);
        # a run overflow retries with the observed count instead of
        # degrading to the classic path
        cap_r = max(
            _pow2_cap(int(q_per * (L // 1024) + cap_g // 2 + 256)),
            cap_r_floor,
        )

        # per-shard delta blocks stack on a leading shard axis
        from kbo_tpu.kernels.refine import get_ext_table

        ext_tab = get_ext_table(dev) if opts.fill_gaps else None
        ew = el = None
        if ext_tab is not None:
            ew = jax.device_put(ext_tab[0], repl)
            el = jax.device_put(ext_tab[1], repl)
        from kbo_tpu.kernels.refine import prob_bound

        delta4, needs_host = _stage2(
            keys3, codes_d, ref_d, len_d, ms_d, uniq_d, rows_d,
            jnp.int32(threshold), prob_bound(opts.max_error_prob), ew, el,
            kk=k, cd=cap_d, cg=cap_g, ce=cap_ext,
            cr=cap_r, dg=bool(opts.fill_gaps), dv=bool(opts.call_variants),
            fm=bool(opts.format), mesh=mesh,
            dl=max(int(threshold) - 1, 0),
            wg=max(k - int(threshold) + 1, 1),
        )
        blocks = np.asarray(delta4).reshape(nd, 4, cap_r)
        max_d = int(blocks[:, 3, 2].max())
        max_g = int(blocks[:, 3, 3].max())
        need_host = int(blocks[:, 3, 4].sum())
        if max_d > cap_d or max_g > cap_g:
            cap_d = max(cap_d, _pow2_cap(max_d))
            cap_g = max(cap_g, _pow2_cap(max_g))
            continue
        if need_host > 0:
            return None  # degrade to the classic mesh path
        max_runs = int(blocks[:, 3, 0].max())
        if max_runs > cap_r:
            cap_r_floor = _pow2_cap(max_runs)
            continue
        break
    else:
        return None

    stats = get_stats()
    if opts.fill_gaps:
        stats.add("gaps_seen", int(blocks[:, 3, 5].sum()))
        stats.add("gaps_filled", int(blocks[:, 3, 6].sum()))
        stats.add("gap_bases_unfilled", int(blocks[:, 3, 7].sum()))
    else:
        stats.add("gap_bases_unfilled", int(blocks[:, 3, 9].sum()))
    if opts.call_variants:
        stats.add("variants_called", int(blocks[:, 3, 8].sum()))

    canvas, row_lens = _canvas(ref_seqs, Q, L, bool(opts.format))
    for s in range(nd):
        n_runs = int(blocks[s, 3, 0])
        # shard s's flat positions are local to its q_per rows; runs
        # never cross contig rows (assemble breaks at row edges) and
        # padding rows have row_lens 0, so painting clips them away
        base = s * q_per * L
        _paint_runs(
            canvas,
            blocks[s, 0, :n_runs] + base,
            blocks[s, 1, :n_runs] + base,
            blocks[s, 2, :n_runs],
            L,
            row_lens,
        )
    return [
        canvas[q * L : q * L + row_lens[q]].tobytes()
        for q in range(len(ref_seqs))
    ]
