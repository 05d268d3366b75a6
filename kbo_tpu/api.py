"""Top-level pipeline API, mirroring the reference's five operations.

reference: src/lib.rs:501-506 build, :547-573 call, :612-628 matches,
:720-761 map, :808-821 find.

Unlike the reference, the LCS array lives inside :class:`SbwtIndex` (it is an
index-format component; the position-parallel MS engine does not need it at
query time), so these functions take the index alone.
"""

from __future__ import annotations

import numpy as np

from kbo_tpu.index.build import build_sbwt_from_seqs
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.index.sbwt import SbwtIndex
from kbo_tpu import engine
from kbo_tpu.ops import derandomize, format as fmt, translate
from kbo_tpu.opts import BuildOpts, CallOpts, FindOpts, MapOpts, MatchOpts
from kbo_tpu.refine import gap_filling, variant_calling
from kbo_tpu.utils.stats import get_stats, stage


def build_device(
    seq_data, build_opts: BuildOpts | None = None, full: bool = False
):
    """Device-built index (no host SBWT construction) -- the TPU-native
    answer to the reference's construction-dominates-one-shot-runs problem.

    Default: an ephemeral find-only index (the sequences' own sorted window
    keys; supports :func:`find`/:func:`find_batch`). With ``full=True``: a
    :class:`kbo_tpu.kernels.ms.DeviceFullIndex` -- three on-device radix
    sorts emit the complete join-table set, so :func:`map_`/:func:`call`
    run against it too; only scalar metadata is ever fetched.
    """
    from kbo_tpu.kernels.ms import DeviceFullIndex, DeviceSeqIndex

    opts = build_opts or BuildOpts()
    seqs = [s.encode() if isinstance(s, str) else bytes(s) for s in seq_data]
    if full:
        return DeviceFullIndex(seqs, opts.k, add_revcomp=opts.add_revcomp)
    return DeviceSeqIndex(seqs, opts.k, add_revcomp=opts.add_revcomp)


def build(seq_data, build_opts: BuildOpts | None = None) -> SbwtIndex:
    """Build an SBWT index (+ LCS) from sequences (reference: src/lib.rs:501-506).

    All sequences merge into one index; individual inputs are not recoverable
    afterwards (reference: src/lib.rs:477-480).
    """
    return build_sbwt_from_seqs(seq_data, build_opts or BuildOpts())


def matches(
    query_seq: bytes, sbwt: SbwtIndex, match_opts: MatchOpts | None = None
) -> list[str]:
    """Translated alignment characters of a query against an index
    (reference: src/lib.rs:612-628)."""
    opts = match_opts or MatchOpts()
    k = sbwt.k
    threshold = derandomize.random_match_threshold(
        k, sbwt.n_kmers, 4, opts.max_error_prob
    )
    with stage("matches", bases=len(query_seq)):
        noisy_ms = engine.compute_ms_values(sbwt, encode_ascii(bytes(query_seq)))
        derand_ms = derandomize.derandomize_ms_vec(noisy_ms, k, threshold)
        return translate.translate_ms_vec(derand_ms, k, threshold)


def find(
    query_seq: bytes, sbwt: SbwtIndex, find_opts: FindOpts | None = None
) -> list[fmt.RLE]:
    """Local alignment segments of a query within the index
    (reference: src/lib.rs:808-821)."""
    opts = find_opts or FindOpts()
    aln = matches(query_seq, sbwt, MatchOpts(max_error_prob=opts.max_error_prob))
    if opts.max_gap_len > 0:
        return fmt.run_lengths_gapped(aln, opts.max_gap_len)
    return fmt.run_lengths(aln)


def find_batch(
    query_seqs: list[bytes],
    sbwt,
    find_opts: FindOpts | None = None,
    mesh=None,
) -> list[list[fmt.RLE]]:
    """Batched :func:`find`: all queries go through one fused device pipeline
    (data-parallel over a mesh when one is given), then per-query RLE
    extraction on host in input order.

    ``sbwt`` may be a full :class:`SbwtIndex` or a device-built
    :class:`kbo_tpu.kernels.ms.DeviceSeqIndex` (index-free one-shot path:
    no host SBWT construction; see ``build_device``).

    This is the serving path the reference delegates to kbo-cli's per-record
    rayon loop (SURVEY §2.3); here the batch dimension is the device
    parallelism axis.
    """
    opts = find_opts or FindOpts()
    if not query_seqs:
        return []
    threshold = derandomize.random_match_threshold(
        sbwt.k, sbwt.n_kmers, 4, opts.max_error_prob
    )
    code_list = [encode_ascii(bytes(q)) for q in query_seqs]
    total = sum(c.size for c in code_list)
    with stage("find_batch", bases=total):
        from kbo_tpu.kernels.ms import DeviceSeqIndex

        if isinstance(sbwt, DeviceSeqIndex):
            assert mesh is None, "device-seq index path is single-device"
            if opts.max_gap_len == 0:
                from kbo_tpu.pipeline import find_rle_batch_seq

                return find_rle_batch_seq(sbwt, code_list, threshold)
            from kbo_tpu.pipeline import matches_batch_seq

            chars_list = matches_batch_seq(sbwt, code_list, threshold)
        elif mesh is not None:
            if opts.max_gap_len == 0:
                # segments extract ON DEVICE per shard; only the compact
                # [Q, 1+5*cap] table crosses the host link (the full
                # [Q, L] chars gather was the scaling path's bottleneck)
                from kbo_tpu.parallel.mesh import find_rle_batch_sharded

                return find_rle_batch_sharded(
                    sbwt, code_list, threshold, mesh=mesh
                )
            from kbo_tpu.parallel.mesh import matches_batch_sharded

            chars_list = matches_batch_sharded(
                sbwt, code_list, threshold, mesh=mesh
            )
        elif opts.max_gap_len == 0:
            # segments are extracted ON DEVICE: a compact per-segment
            # table is fetched instead of the full [Q, L] chars array
            from kbo_tpu.pipeline import find_rle_batch

            return find_rle_batch(sbwt, code_list, threshold)
        else:
            from kbo_tpu.pipeline import matches_batch

            chars_list = matches_batch(sbwt, code_list, threshold)
    out = []
    for chars in chars_list:
        aln = [chr(c) for c in chars]
        if opts.max_gap_len > 0:
            out.append(fmt.run_lengths_gapped(aln, opts.max_gap_len))
        else:
            out.append(fmt.run_lengths(aln))
    return out


def call(
    sbwt_query: SbwtIndex,
    ref_seq: bytes,
    call_opts: CallOpts | None = None,
    noisy_ms=None,
    ivals=None,
    drops=None,
    anchors=None,
    anchor_rows=None,
    mesh=None,
) -> list[variant_calling.Variant]:
    """Call variants between a query index and a reference sequence
    (reference: src/lib.rs:547-573).

    Note the argument inversion mirrored from the reference: inside
    ``call_variants`` the roles swap -- the "reference index" slot receives
    the user's QUERY index and the streamed "query" is the user's REFERENCE
    sequence, so ``Variant.query_pos`` is a position in the user's reference,
    matching VCF POS semantics (reference: src/lib.rs:561-568).
    """
    import os

    opts = call_opts or CallOpts()
    ref_seq = bytes(ref_seq)
    with stage("call", bases=len(ref_seq)):
        device_ok = (
            os.environ.get("KBO_TPU_BACKEND", "auto") != "host"
            and len(ref_seq) >= 1024
        )
        if device_ok:
            # skip the reference's index-construction-inside-call
            # (src/lib.rs:553): the per-candidate k-mer MS re-runs join
            # directly against the reference sequence's window keys on
            # device (engine.compute_ms_values_vs_seq)
            assert opts.sbwt_build_opts.k == sbwt_query.k
            ref_codes = encode_ascii(ref_seq)
            if noisy_ms is None and drops is None and ivals is None:
                # standalone call: detect MS drops ON DEVICE and fetch
                # only the compacted positions -- the full [L] int32 MS
                # download costs more than the sweep through a remote
                # relay. The device row feeds the sparse interval
                # provider so nothing full-length ever leaves the chip.
                from kbo_tpu.kernels.ms import (
                    ms_drops_device,
                    query_ms_row_device,
                )

                d = derandomize.random_match_threshold(
                    sbwt_query.k, sbwt_query.n_kmers, 4, opts.max_error_prob
                )
                row = query_ms_row_device(sbwt_query, ref_codes)
                drops = ms_drops_device(row, d)
                ivals = engine.SparseIntervals(
                    sbwt_query, ref_codes, ms=row
                )
            if opts.sbwt_build_opts.add_revcomp:
                from kbo_tpu.index.encode import revcomp_ascii

                sep = np.array([255], dtype=np.uint8)
                ref_codes = np.concatenate(
                    [ref_codes, sep, encode_ascii(revcomp_ascii(ref_seq))]
                )
            inner = ref_codes
        else:
            sbwt_ref = build([ref_seq], opts.sbwt_build_opts)
            assert sbwt_ref.k == sbwt_query.k
            inner = sbwt_ref
        variants = variant_calling.call_variants(
            sbwt_query,  # -> call_variants' sbwt_ref slot
            inner,  # -> call_variants' sbwt_query slot (index or raw codes)
            ref_seq,
            opts.max_error_prob,
            noisy_ms=noisy_ms,
            ivals=ivals,
            drops=drops,
            anchors=anchors,
            anchor_rows=anchor_rows,
            mesh=mesh,
        )
    get_stats().add("variants_called", len(variants))
    return variants


def map_(
    ref_seq: bytes, query_sbwt: SbwtIndex, map_opts: MapOpts | None = None
) -> bytes:
    """Map a query (as an index) onto reference coordinates
    (reference: src/lib.rs:720-761). Role inversion: the QUERY is indexed and
    the REFERENCE sequence is streamed through it.

    Tiny inputs run the host-oracle pipeline; everything else delegates to
    :func:`map_batch` (fused device sweep, sparse refinement).
    """
    import os

    opts = map_opts or MapOpts()
    ref_seq = bytes(ref_seq)
    host = isinstance(query_sbwt, SbwtIndex) and (
        os.environ.get("KBO_TPU_BACKEND", "auto") == "host"
        or len(ref_seq) < 256
    )
    if not host:
        return map_batch([ref_seq], query_sbwt, opts)[0]

    k = query_sbwt.k
    if opts.call_variants:
        assert k == opts.sbwt_build_opts.k
    threshold = derandomize.random_match_threshold(
        k, query_sbwt.n_kmers, 4, opts.max_error_prob
    )

    ref_codes = encode_ascii(ref_seq)
    noisy_ms = engine.compute_ms_values(query_sbwt, ref_codes)
    derand_ms = derandomize.derandomize_ms_vec(noisy_ms, k, threshold)
    translation = translate.translate_ms_vec(derand_ms, k, threshold)

    if opts.fill_gaps:
        # colex intervals are only read inside each gap's search window, so
        # hand fill_gaps a lazy provider instead of a full interval pass
        ivals = engine.SparseIntervals(query_sbwt, ref_codes, ms=noisy_ms)
        refined = gap_filling.fill_gaps(
            translation, noisy_ms, ivals, ref_seq, query_sbwt, threshold,
            opts.max_error_prob,
        )
    else:
        refined = translation

    if opts.call_variants:
        call_opts = CallOpts(
            max_error_prob=opts.max_error_prob,
            sbwt_build_opts=opts.sbwt_build_opts,
        )
        variants = call(query_sbwt, ref_seq, call_opts)
        with_variants = translate.add_variants(refined, variants)
    else:
        with_variants = refined

    if opts.format:
        return fmt.relative_to_ref(ref_seq, with_variants)
    return "".join(with_variants).encode("latin-1")


def _pow2_cap(n: int, lo: int = 256) -> int:
    c = lo
    while c < n:
        c <<= 1
    return c


def map_batch(
    ref_seqs: list[bytes],
    query_sbwt: SbwtIndex,
    map_opts: MapOpts | None = None,
    mesh=None,
) -> list[bytes]:
    """Batched :func:`map_` over many reference contigs.

    Device path ("sparse-fetch"): the MS sweep + derandomize + translate for
    ALL contigs runs as one fused device call that also compacts the
    refinement candidates (MS drops, gap runs) on device; the dense
    chars/MS arrays never cross the device->host boundary. Refinement
    produces (position, char) patches, which are scattered back on device;
    the output is fetched as run-length deltas against the reference and
    reconstructed on host (kernels/mapsweep.py).

    ``KBO_TPU_MAP_DENSE=1`` forces the round-1 dense-fetch path (used by
    the differential tests).
    """
    import os

    opts = map_opts or MapOpts()
    if not ref_seqs:
        return []
    if (
        os.environ.get("KBO_TPU_BACKEND", "auto") != "host"
        and os.environ.get("KBO_TPU_MAP_DENSE", "0") != "1"
    ):
        return _map_batch_sparse(ref_seqs, query_sbwt, opts, mesh=mesh)
    assert mesh is None, "the dense/host map path is single-device"
    return _map_batch_dense(ref_seqs, query_sbwt, opts)


def _map_batch_sparse(
    ref_seqs: list[bytes],
    query_sbwt: SbwtIndex,
    opts: MapOpts,
    mesh=None,
) -> list[bytes]:
    import jax.numpy as jnp

    from kbo_tpu.kernels.mapsweep import (
        assemble_map,
        fetch_candidates,
        fetch_delta_runs,
    )
    from kbo_tpu.pipeline import pad_batch

    k = query_sbwt.k
    if opts.call_variants:
        assert k == opts.sbwt_build_opts.k
    threshold = derandomize.random_match_threshold(
        k, query_sbwt.n_kmers, 4, opts.max_error_prob
    )
    dev = engine.device_index(query_sbwt)
    from kbo_tpu.kernels.ms import INVALID as _INV, _bucket as _kb

    # shapes come from the byte lengths alone (1 code per byte); the host
    # encode of the whole genome is DEFERRED -- the devref fast path
    # derives the sweep codes on device from the packed reference upload
    # and never reads a host code array
    seq_lens = np.asarray([len(r) for r in ref_seqs], dtype=np.int32)
    Q0 = len(ref_seqs)
    Q = Q0
    if mesh is not None:
        nd = mesh.devices.size
        Q = ((Q0 + nd - 1) // nd) * nd
    L = _kb(int(seq_lens.max()))
    lengths = np.zeros(Q, dtype=np.int32)
    lengths[:Q0] = seq_lens

    _lazy: dict = {}

    def get_code_list():
        if "cl" not in _lazy:
            _lazy["cl"] = [encode_ascii(bytes(r)) for r in ref_seqs]
        return _lazy["cl"]

    def get_codes():
        if "codes" not in _lazy:
            arr = np.full((Q, L), _INV, dtype=np.uint8)
            for i, c in enumerate(get_code_list()):
                arr[i, : c.size] = c
            _lazy["codes"] = arr
        return _lazy["codes"]

    total_bases = int(seq_lens.sum())
    # patch/delta positions travel as int32 flat offsets (q * L + i)
    assert Q * L < 2**31, "padded batch exceeds the int32 position space"

    import os

    import jax as _jax

    # The fused 3-bit sweep is the fast path. Its XLA:TPU compile time is
    # superlinear in dispatch size (round 2 measured >20 min at 4.6M on
    # the remote compiler vs ~2 min at 2M), and the packed join caps
    # table_width + probes at 2^24 slots with k < 128
    # (kernels.ms.ms3_rows_core) -- so beyond the single-shot comfort
    # zone the sweep runs CHUNKED: fixed-shape sub-dispatches with k-1
    # context (exact; one compile covers any length). KBO_TPU_MAP_FUSED:
    # 1 forces single-shot, 0 forces the classic 2-bit sweep, auto picks
    # single-shot -> chunked -> classic. KBO_TPU_MAP_CHUNK overrides the
    # chunk size (positions per sub-dispatch).
    fused_env = os.environ.get("KBO_TPU_MAP_FUSED", "auto")
    on_tpu = _jax.devices()[0].platform == "tpu"
    # the join's slot budget counts the DEVICE table width (bucketed, with
    # a sentinel tail -- larger than n_rows), not the logical row count
    slot_budget = (1 << 24) - 1 - int(dev.keys3.shape[1])
    full_fits = k < 128 and Q * (L + k - 1) < slot_budget
    max_chunk = slot_budget // max(Q, 1) - (k - 1)
    chunk = 0
    if k < 128 and mesh is None and fused_env != "0":
        chunk_env = int(os.environ.get("KBO_TPU_MAP_CHUNK", "0"))
        if chunk_env > 0:
            chunk = min(chunk_env, max_chunk)
        elif (on_tpu and L > 3_000_000) or not full_fits:
            # equalized chunks on the 1/8-octave bucket grid: the fewest
            # sub-dispatches whose fixed shape stays within the
            # compile-proven size (~2.4M measured on TPU) and the slot
            # budget. Each chunk re-scans the key table, so fewer+larger
            # chunks win (3x2M -> 2x2.36M saved ~35 ms at 4.6M); the
            # bucket grid keeps the set of compiled chunk shapes small.
            from kbo_tpu.kernels.ms import _bucket as _kbucket

            target = min(2_400_000, max_chunk)
            n_chunks = max(1, -(-L // target))
            chunk = min(_kbucket(-(-L // n_chunks)), max_chunk)
    use_chunked = (
        mesh is None
        and fused_env != "0"
        and 0 < chunk < L
        and chunk >= 4 * k
        and (not full_fits or (on_tpu and L > 3_000_000) or
             int(os.environ.get("KBO_TPU_MAP_CHUNK", "0")) > 0)
    )
    use_fused = (
        mesh is None
        and (
            (full_fits and fused_env == "1")
            or (
                full_fits
                and fused_env == "auto"
                and not (on_tpu and L > 3_000_000)
            )
            or use_chunked
        )
    )

    if (
        mesh is not None
        and "data" in mesh.axis_names
        and Q0 < mesh.devices.size
        and os.environ.get("KBO_TPU_MAP_SEQSH", "1") != "0"
        and not (opts.call_variants and opts.sbwt_build_opts.add_revcomp)
        and k < 128
    ):
        # fewer contigs than devices: contig-granular data parallelism
        # cannot fill the mesh (the flagship workload is ONE multi-Mb
        # pair), so the SEQUENCE position-shards over the data axis
        from kbo_tpu.kernels.refine import max_tag
        from kbo_tpu.parallel.mesh import map_seq_sharded

        nd = mesh.devices.size
        chunk = -(-L // nd)
        table_w = int(dev.keys3.shape[1])
        if (
            chunk >= max(k, 256)
            and Q0 <= max_tag(k)
            and table_w + Q0 * (chunk + 2 * (k - 1)) < (1 << 24) - 1
        ):
            return map_seq_sharded(
                ref_seqs, query_sbwt, opts, mesh=mesh,
                code_list=get_code_list(),
            )

    if (
        mesh is not None
        and "data" in mesh.axis_names
        and os.environ.get("KBO_TPU_MAP_DEVREF", "1") != "0"
        and not (opts.call_variants and opts.sbwt_build_opts.add_revcomp)
        and k < 128
    ):
        from kbo_tpu.kernels.refine import max_tag
        from kbo_tpu.refine.device_map import map_devref_data_sharded

        q_per = (Q + mesh.devices.size - 1) // mesh.devices.size
        table_w = int(dev.keys3.shape[1])
        if (
            q_per <= max_tag(k)
            and table_w + q_per * (L + k - 1) < (1 << 24) - 1
        ):
            with stage("map_sweep", bases=total_bases):
                out = map_devref_data_sharded(
                    ref_seqs, query_sbwt, get_code_list(), opts, threshold, mesh
                )
            if out is not None:
                return out
            # extension-budget gaps or persistent overflow: degrade to
            # the classic mesh sweep + host refinement below

    with stage("map_sweep", bases=total_bases):
        # optimistic capacities: only a denser-than-expected input pays a
        # second exactly-sized pass. Drops (SNP sites) run ~1/kb on
        # same-species pairs; gap runs (indels / low-identity stretches)
        # are 10-100x rarer AND 10-100x more expensive per slot to score
        # (score_gaps materializes [cap_g, k+1, k] candidate windows +
        # cap_ext extension lanes), so the gap capacity starts much
        # smaller -- measured on TPU at 4.6M, cap_g 16384 -> 1024 takes
        # score_gaps from 1.35 s to ~0.1 s with identical output
        # cap_g covers ~0.65 gap runs/kb with pow2 headroom: measured on
        # the 1 SNP/kb benchmark, ~77% of SNP sites become 1-base gap
        # runs after derandomize (3533 runs at 4.6M -> 4096 slots, no
        # retry), while 1/8192 priors forced a retry and 1/512 paid ~2x
        # in score_gaps for empty slots. Drops run ~0.8/kb on the same
        # workload, so the 1/1024 prior still carries ~2.3x headroom;
        # every drop slot costs k - threshold + 1 probe lanes in the
        # rk-vs-seq join, so halving the slots halves that join
        cap_d = _pow2_cap(L // 1024)
        cap_g = _pow2_cap(L // 1536, lo=256)
        scan_block = None
        if mesh is not None or not use_fused:
            if mesh is not None:
                from kbo_tpu.parallel.mesh import map_sweep_compact_sharded

                codes_dev, (
                    chars_dev,
                    ms_dev,
                    counts_dev,
                    drop_pos_dev,
                    gap_start_dev,
                    gap_end_dev,
                ) = map_sweep_compact_sharded(
                    dev, get_codes(), lengths, threshold, mesh
                )
            else:  # classic single-device 2-bit sweep (see gate above)
                from kbo_tpu.kernels.mapsweep import map_sweep_compact

                codes_dev = jnp.asarray(get_codes())
                (
                    chars_dev,
                    ms_dev,
                    counts_dev,
                    drop_pos_dev,
                    gap_start_dev,
                    gap_end_dev,
                ) = map_sweep_compact(
                    dev.keys2, dev.cap2, codes_dev,
                    jnp.asarray(lengths), k, jnp.int32(threshold),
                )
            packed = np.asarray(
                fetch_candidates(counts_dev, drop_pos_dev, gap_start_dev,
                                 gap_end_dev, cap_d, cap_g)
            )
            counts = packed[:, :2]
            if (
                int(counts[:, 0].max()) > cap_d
                or int(counts[:, 1].max()) > cap_g
            ):
                cap_d = max(cap_d, _pow2_cap(int(counts[:, 0].max())))
                cap_g = max(cap_g, _pow2_cap(int(counts[:, 1].max())))
                packed = np.asarray(
                    fetch_candidates(counts_dev, drop_pos_dev, gap_start_dev,
                                     gap_end_dev, cap_d, cap_g)
                )
            packed = packed[:, 2:]
        else:
            # fused single dispatch: 3-bit join (MS + uniqueness + rows),
            # derandomize/translate, candidate compaction, device-side
            # anchors + gap grids -- ONE packed fetch for everything the
            # host refinement needs (kernels/mapsweep.py)
            from kbo_tpu.kernels.mapsweep import (
                map_postprocess3,
                ms3_rows_sweep,
            )
            from kbo_tpu.kernels.refine import max_tag

            # revcomp inner indexes are supported here: the rk-vs-seq join
            # table extends with the reverse-complement windows
            # (kernels.refine.with_revcomp_rows), matching the reference's
            # both-strand inner index (src/lib.rs:553). The mesh-sharded
            # paths still gate it out upstream.
            use_devref = (
                os.environ.get("KBO_TPU_MAP_DEVREF", "1") != "0"
                and Q <= max_tag(k)
            )
            # single-contig maps reuse the sweep's internally sorted query
            # window keys as the rk-vs-seq join table (the per-map-call
            # genome-sized seq_keys3_tagged sort disappears; see
            # kernels.ms.ms3_rows_core want_qtable). KBO_TPU_SEQ_REUSE=0
            # restores the standalone sort for differential testing.
            want_qt = (
                use_devref
                and opts.call_variants
                and Q == 1
                and not getattr(opts.sbwt_build_opts, "add_revcomp", False)
                and os.environ.get("KBO_TPU_MAP_FUSE_REFINE", "0") != "1"
                and os.environ.get("KBO_TPU_SEQ_REUSE", "1") != "0"
            )
            ref_mat = ref_mat_dev = None
            seq_tables = None
            ms_dev = None
            if use_devref:
                # ONE upload, 2-bit packed: the refinement/assembly
                # stages need the raw reference bytes anyway, so ship a
                # packed form (4 bases/byte + an exception list for
                # non-uppercase-ACGT bytes), reconstruct the exact raw
                # matrix on device, and derive the sweep codes from it
                # (encode_ascii_device) -- ~1/8 of the naive two-array
                # upload through the relay. Dense exceptions (soft-
                # masked genomes) fall back to the raw upload. On the
                # chunked sweep the upload is chunked along the SAME
                # grid so pack/transfer of chunk c+1 overlap the sweep
                # of chunk c (KBO_TPU_PIPE_UPLOAD=0 restores one-shot).
                from kbo_tpu.kernels.mapsweep import (
                    decode_packed4_device,
                    encode_ascii_device,
                    pack_ascii_host,
                )

                ref_mat = np.zeros((Q, L), dtype=np.uint8)
                for q, r in enumerate(ref_seqs):
                    ref_mat[q, : len(r)] = np.frombuffer(
                        bytes(r), dtype=np.uint8
                    )
                pipelined = None
                if (
                    use_chunked
                    and os.environ.get("KBO_TPU_PIPE_UPLOAD", "1") != "0"
                ):
                    from kbo_tpu.kernels.mapsweep import (
                        upload_sweep_chunked_pipelined,
                    )
                    from kbo_tpu.kernels.ms import get_rows_merge_streams

                    pipelined = upload_sweep_chunked_pipelined(
                        dev.keys3, dev.lcs3, ref_mat, lengths, k, chunk,
                        want_qtable=want_qt,
                        a_streams=get_rows_merge_streams(dev),
                    )
                if pipelined is not None:
                    (
                        ref_mat_dev, codes_dev, ms_dev, uniq_dev, rows_dev,
                        seq_tables,
                    ) = pipelined
                else:
                    packed_up = pack_ascii_host(ref_mat, lengths)
                    if packed_up is not None:
                        from kbo_tpu.kernels.mapsweep import (
                            decode_packed4_encode_device,
                        )

                        ref_mat_dev, codes_dev = decode_packed4_encode_device(
                            jnp.asarray(packed_up[0]),
                            jnp.asarray(packed_up[1]),
                            jnp.asarray(packed_up[2]),
                            jnp.asarray(lengths),
                        )
                    else:
                        ref_mat_dev = jnp.asarray(ref_mat)
                        codes_dev = encode_ascii_device(ref_mat_dev)
            else:
                codes_dev = jnp.asarray(get_codes())
            lengths_dev = jnp.asarray(lengths)
            thr = jnp.int32(threshold)
            # the join stage is cap-independent: the capacity-overflow
            # retry below reuses its device outputs and re-runs only the
            # postprocess stage
            if ms_dev is None:
                from kbo_tpu.kernels.ms import get_rows_merge_streams

                streams = get_rows_merge_streams(dev)
                if use_chunked:
                    from kbo_tpu.kernels.mapsweep import (
                        ms3_rows_sweep_chunked,
                    )

                    out_sweep = ms3_rows_sweep_chunked(
                        dev.keys3, dev.lcs3, codes_dev, k, chunk,
                        want_qtable=want_qt, a_streams=streams,
                    )
                else:
                    out_sweep = ms3_rows_sweep(
                        dev.keys3, dev.lcs3, codes_dev, k,
                        want_qtable=want_qt, a_streams=streams,
                    )
                ms_dev, uniq_dev, rows_dev = out_sweep[:3]
                if want_qt:
                    seq_tables = out_sweep[3]

            # the gap-candidate window never exceeds k - threshold + 1
            # positions (kernels.mapsweep.map_postprocess3 docstring), so
            # the grid, its gathers and the score_gaps candidate stage all
            # shrink ~2x at production thresholds
            w_grid = max(k - threshold + 1, 1)

            def run_post(cap_d, cap_g):
                return map_postprocess3(
                    ms_dev, uniq_dev, rows_dev, lengths_dev, k, thr,
                    cap_d, cap_g, w_grid,
                )

            # fully-on-device refinement (kernels/refine.py): variant
            # resolution + gap scoring + patch assembly never leave the
            # chip, and the steady-state map pays ONE fetch (delta runs +
            # counters). Gated off for revcomp inner indexes (the device
            # join tables carry the forward text only) and contig counts
            # beyond the tag capacity; KBO_TPU_MAP_DEVREF=0 forces the
            # packed-fetch host refinement for differentials.
            if use_devref:
                from kbo_tpu.refine.device_map import (
                    DevRefOverflow,
                    map_devref_finish,
                )

                # ONE-dispatch refinement (postprocess -> resolve ->
                # score -> assemble -> packed delta): per-dispatch
                # submission overhead through a remote TPU link is ~25 ms,
                # so collapsing the ~6-dispatch chain is worth ~0.15 s at
                # the 4.6M benchmark. Falls back to the multi-dispatch
                # path when a gap needs the exact host evaluator.
                if os.environ.get("KBO_TPU_MAP_FUSE_REFINE", "0") == "1":
                    from kbo_tpu.refine.device_map import map_devref_fused

                    out = map_devref_fused(
                        dev, codes_dev, lengths_dev, ms_dev, uniq_dev,
                        rows_dev, ref_seqs, opts, threshold, cap_d, cap_g,
                        w_grid, ref_mat=ref_mat, ref_mat_dev=ref_mat_dev,
                    )
                    if out is not None:
                        return out

                while True:
                    chars_dev, packed_dev, pieces = run_post(cap_d, cap_g)
                    try:
                        return map_devref_finish(
                            dev, codes_dev, lengths_dev, ms_dev,
                            chars_dev, pieces, packed_dev, ref_seqs,
                            query_sbwt, None, opts, threshold,
                            cap_d, cap_g,
                            total_gap_slack=cap_g * 2 + 64,
                            ref_mat=ref_mat, ref_mat_dev=ref_mat_dev,
                            seq_tables=seq_tables,
                        )
                    except DevRefOverflow as o:
                        # grow only the overflowed capacity (shrinking the
                        # other would recompile for nothing)
                        cap_d = max(cap_d, _pow2_cap(o.need_d))
                        cap_g = max(cap_g, _pow2_cap(o.need_g))

            chars_dev, packed_dev, _pieces = run_post(cap_d, cap_g)
            block = np.asarray(packed_dev)
            counts = block[:, :2]
            if (
                int(counts[:, 0].max()) > cap_d
                or int(counts[:, 1].max()) > cap_g
            ):
                cap_d = max(cap_d, _pow2_cap(int(counts[:, 0].max())))
                cap_g = max(cap_g, _pow2_cap(int(counts[:, 1].max())))
                chars_dev, packed_dev, _pieces = run_post(cap_d, cap_g)
                block = np.asarray(packed_dev)
            packed = block[:, 2 : 2 + cap_d + 2 * cap_g]
            scan_block = block[:, 2 + cap_d + 2 * cap_g :]

    patch_pos: list[np.ndarray] = []
    patch_val: list[np.ndarray] = []
    unfilled_bases = 0
    total_gap_runs = 0
    for q, ref_seq in enumerate(ref_seqs):
        ref_seq = bytes(ref_seq)
        n_ref = len(ref_seq)
        nd, ng = int(counts[q, 0]), int(counts[q, 1])
        drops = packed[q, :nd].astype(np.int64)
        runs = list(
            zip(
                packed[q, cap_d : cap_d + ng].tolist(),
                packed[q, cap_d + cap_g : cap_d + cap_g + ng].tolist(),
            )
        )
        ivals = engine.SparseIntervals(
            query_sbwt, get_code_list()[q], ms=ms_dev[q], dev_codes=codes_dev[q]
        )
        anchors = anchor_rows = grid = None
        if scan_block is not None:
            # device-resolved anchors + gap probe grid, fetched as part of
            # the sweep's single packed block
            scan = scan_block[q].astype(np.int64)
            if opts.call_variants and drops.size:
                anchors = scan[: drops.size]
                anchor_rows = scan[cap_d : cap_d + drops.size]
            if opts.fill_gaps and runs:
                grid = scan[2 * cap_d :].reshape(
                    cap_g, max(k - threshold + 1, 1)
                )
        else:
            # mesh / classic path: one union interval prefetch; anchor rounds and the
            # gap evaluator read from the provider's cache
            probe_parts = []
            if opts.fill_gaps and runs:
                probe_parts.append(
                    gap_filling.gap_probe_positions(runs, n_ref, k, threshold)
                )
            if opts.call_variants and drops.size:
                # anchors need ms[j] >= threshold, which after a clean
                # variant first happens near offset=threshold -- prefetch
                # through threshold+16 so the 8-offset rounds hit cache
                hi_off = min(threshold + 16, k)
                cand = np.unique(
                    (drops[:, None] + np.arange(1, hi_off + 1)[None, :])
                    .reshape(-1)
                )
                probe_parts.append(cand[cand < n_ref])
            if probe_parts:
                ivals.prefetch(np.unique(np.concatenate(probe_parts)))
        patches: dict[int, int] = {}
        total_gap_runs += len(runs)
        clamped_gap_bases = sum(
            max(0, min(e, n_ref - threshold) - s) for s, e in runs
        )
        if opts.fill_gaps:
            gp = gap_filling.fill_gaps_patches(
                runs, ivals, ref_seq, query_sbwt, threshold,
                opts.max_error_prob, grid=grid,
            )
            unfilled_bases += max(0, clamped_gap_bases - len(gp))
            for pos, ch in gp:
                patches[pos] = ch
        else:
            unfilled_bases += clamped_gap_bases
        if opts.call_variants:
            variants = call(
                query_sbwt,
                ref_seq,
                CallOpts(
                    max_error_prob=opts.max_error_prob,
                    sbwt_build_opts=opts.sbwt_build_opts,
                ),
                ivals=ivals,
                drops=drops,
                anchors=anchors,
                anchor_rows=anchor_rows,
                mesh=mesh,
            )
            for pos, ch in translate.variant_patches(variants):
                patches[pos] = ch
        if patches:
            pp = np.fromiter(patches.keys(), dtype=np.int64)
            patch_pos.append((pp + q * L).astype(np.int32))
            patch_val.append(
                np.fromiter(patches.values(), dtype=np.int64).astype(np.uint8)
            )

    with stage("map_assemble", bases=total_bases):
        n_p = sum(p.size for p in patch_pos)
        cap_p = _pow2_cap(max(n_p, 1))
        pp = np.full(cap_p, Q * L, dtype=np.int32)  # out of range = inert
        pv = np.zeros(cap_p, dtype=np.uint8)
        if n_p:
            pp[:n_p] = np.concatenate(patch_pos)
            pv[:n_p] = np.concatenate(patch_val)
        ref_mat = np.zeros((Q, L), dtype=np.uint8)
        for q, r in enumerate(ref_seqs):
            ref_mat[q, : len(r)] = np.frombuffer(bytes(r), dtype=np.uint8)
        counts2_dev, rs_dev, re_dev, rv_dev = assemble_map(
            chars_dev,
            jnp.asarray(ref_mat),
            jnp.asarray(lengths),
            jnp.asarray(pp),
            jnp.asarray(pv),
            bool(opts.format),
        )
        get_stats().add("gap_bases_unfilled", unfilled_bases)
        # optimistic single fetch: deltas are RUN-encoded, so the count is
        # bounded by patches (worst case one run each) + gap runs + a small
        # margin for flank '-' stretches; a miss pays one refetch
        cap_r = _pow2_cap(n_p + total_gap_runs + 256)
        delta = np.asarray(
            fetch_delta_runs(counts2_dev, rs_dev, re_dev, rv_dev, cap_r)
        )
        n_runs = int(delta[3, 0])
        if n_runs > cap_r:
            cap_r = _pow2_cap(n_runs)
            delta = np.asarray(
                fetch_delta_runs(counts2_dev, rs_dev, re_dev, rv_dev, cap_r)
            )

    out: list[bytes] = []
    for q, ref_seq in enumerate(ref_seqs):
        n = len(ref_seq)
        if opts.format:
            buf = bytearray(bytes(ref_seq))
        else:
            buf = bytearray(b"M" * n)
        out.append(buf)
    for j in range(n_runs):
        s, e, v = int(delta[0, j]), int(delta[1, j]), int(delta[2, j])
        q = s // L
        s_local = s - q * L
        e_local = min(e - q * L, len(out[q]))
        out[q][s_local:e_local] = bytes([v]) * (e_local - s_local)
    return [bytes(b) for b in out]


def _map_batch_dense(
    ref_seqs: list[bytes],
    query_sbwt: SbwtIndex,
    opts: MapOpts,
) -> list[bytes]:
    """Dense-fetch map path: downloads full chars/MS arrays per contig.

    Kept as the differential/fallback twin of :func:`_map_batch_sparse`
    (every full-length array crossing the relay costs ~100ms/MB)."""
    k = query_sbwt.k
    if opts.call_variants:
        assert k == opts.sbwt_build_opts.k
    threshold = derandomize.random_match_threshold(
        k, query_sbwt.n_kmers, 4, opts.max_error_prob
    )
    from kbo_tpu.pipeline import matches_ms_batch

    code_list = [encode_ascii(bytes(r)) for r in ref_seqs]
    with stage("map_sweep", bases=sum(c.size for c in code_list)):
        chars_list, ms_list = matches_ms_batch(query_sbwt, code_list, threshold)

    out = []
    for ref_seq, ref_codes, chars, noisy_ms in zip(
        ref_seqs, code_list, chars_list, ms_list
    ):
        ref_seq = bytes(ref_seq)
        translation = [chr(c) for c in chars]
        # one lazy interval provider per contig: gap filling and variant
        # calling read colex intervals at different candidate positions but
        # share the cache (each miss batch is a device round trip)
        ivals = engine.SparseIntervals(query_sbwt, ref_codes, ms=noisy_ms)
        if opts.fill_gaps:
            refined = gap_filling.fill_gaps(
                translation, noisy_ms, ivals, ref_seq, query_sbwt,
                threshold, opts.max_error_prob,
            )
        else:
            refined = translation
        if opts.call_variants:
            variants = call(
                query_sbwt,
                ref_seq,
                CallOpts(
                    max_error_prob=opts.max_error_prob,
                    sbwt_build_opts=opts.sbwt_build_opts,
                ),
                noisy_ms=noisy_ms,
                ivals=ivals,
            )
            refined = translate.add_variants(refined, variants)
        if opts.format:
            out.append(fmt.relative_to_ref(ref_seq, refined))
        else:
            out.append("".join(refined).encode("latin-1"))
    return out
