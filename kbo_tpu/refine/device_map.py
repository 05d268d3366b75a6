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
    ref_mat = np.zeros((Q, L), dtype=np.uint8)
    for q, r in enumerate(ref_seqs):
        ref_mat[q, : len(r)] = np.frombuffer(bytes(r), dtype=np.uint8)
    ref_mat_dev = jnp.asarray(ref_mat)

    pos_grids: list = []
    pv_grids: list = []
    n_var_dev = jnp.int32(0)
    gap_counters_dev = jnp.zeros(3, jnp.int32)
    needs_host_dev = None
    # prefix-sharded index placement: a Sharded3Index carries its mesh and
    # the refine kernels run inside shard_map with the table's collectives
    # (parallel/mesh.py); everything else is identical
    model_mesh = getattr(dev, "model_mesh", None)
    cap_ge = cap_g  # device gap scoring covers every compacted slot
    # extension lanes scale with the TOTAL gap count across contigs: in
    # the k < 2*threshold+1 regime every gap fill needs extension and a
    # gap can own up to ~(k-2t) case_b candidates. An overflow flags the
    # owning gaps to the host evaluator, so undersizing costs round
    # trips, not correctness.
    cap_ext = _pow2_cap(max(cap_g, 32 * Q), lo=256)
    if opts.fill_gaps:
        if model_mesh is not None:
            from kbo_tpu.parallel.mesh import sharded_score_gaps

            gpos, gpv, needs_host_dev, gap_counters_dev = sharded_score_gaps(
                dev.keys3, ref_mat_dev, lengths_dev,
                pieces["gap_start"], pieces["gap_end_at"], pieces["grid"],
                jnp.int32(threshold), k=k, cap_ge=cap_ge, cap_ext=cap_ext,
                mesh=model_mesh,
            )
        else:
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
            )
        pos_grids.append(gpos)
        pv_grids.append(gpv)
    if opts.call_variants:
        seq_words = seq_keys3_tagged(codes_dev, k=k)
        if model_mesh is not None:
            from kbo_tpu.parallel.mesh import sharded_resolve_variants

            vpos, vpv, n_var_dev = sharded_resolve_variants(
                dev.keys3, seq_words, codes_dev, ref_mat_dev, ms_dev,
                lengths_dev, pieces["drop_pos"], pieces["apos"],
                pieces["arow"], jnp.int32(threshold), k=k, cap_d=cap_d,
                mesh=model_mesh,
            )
        else:
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
            )
        pos_grids.append(vpos)
        pv_grids.append(vpv)

    counts2_dev, rs_dev, re_dev, rv_dev = assemble_map_prio(
        chars_dev, ref_mat_dev, lengths_dev, pos_grids, pv_grids,
        bool(opts.format),
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
    # Optimistic run budget: ~1 delta run per variant site (L/512 slots
    # cover 1-per-kb densities with margin) + gap-run slack + flanks; an
    # underestimate pays one exactly-sized refetch below.
    cap_r = _pow2_cap(int(L // 512 + total_gap_slack + 256))
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
            grid_all = packed[q, grid_off : grid_off + cap_g * (k + 1)]
            grid_sel = grid_all.reshape(cap_g, k + 1)[sel]
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
                bool(opts.format),
            )
            delta = np.asarray(
                fetch_delta_runs_extras(
                    counts2_dev, rs_dev, re_dev, rv_dev, extras_dev, cap_r
                )
            )
            n_runs = int(delta[3, 0])

    if n_runs > cap_r:
        cap_r = _pow2_cap(n_runs)
        delta = np.asarray(
            fetch_delta_runs_extras(
                counts2_dev, rs_dev, re_dev, rv_dev, extras_dev, cap_r
            )
        )
        n_runs = int(delta[3, 0])

    out: list[bytearray] = []
    for ref_seq in ref_seqs:
        n = len(ref_seq)
        if opts.format:
            out.append(bytearray(bytes(ref_seq)))
        else:
            out.append(bytearray(b"M" * n))
    for j in range(n_runs):
        s, e, v = int(delta[0, j]), int(delta[1, j]), int(delta[2, j])
        q = s // L
        s_local = s - q * L
        e_local = min(e - q * L, len(out[q]))
        out[q][s_local:e_local] = bytes([v]) * (e_local - s_local)
    return [bytes(b) for b in out]
