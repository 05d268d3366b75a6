"""Multi-chip execution over a jax.sharding.Mesh.

The reference is single-threaded (SURVEY §2.3); this layer is the new
framework's scaling dimension, per BASELINE.json's north star:

- the SBWT rank tables are REPLICATED per device (bacterial indexes are tens
  of MB; a per-k-mer-prefix sharding is the documented alternative for
  larger-than-HBM indexes),
- query batches are data-parallel over the ``data`` mesh axis via shard_map,
- per-query outputs come back in input order (deterministic merge: outputs
  are fixed-shape [Q, L] arrays; variable-length RLE/variant extraction
  happens host-side per query after the gather).

Multi-host execution uses the same code path after
``jax.distributed.initialize()`` (XLA collectives ride ICI/DCN; there is no
NCCL/MPI anywhere in the design).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kbo_tpu.index.sbwt import SbwtIndex
from kbo_tpu.kernels.ms import INVALID
from kbo_tpu.pipeline import matches_pipeline_core, pad_batch


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def put_global(mesh: Mesh, spec: P, arr) -> jax.Array:
    """Place a host array onto a (possibly multi-process) mesh.

    Every process passes the SAME full array; each contributes its
    addressable shards, which is what a multi-host `device_put` cannot do
    directly. Single-process this is exactly `device_put`.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_matches(
    keys2, cap2, codes, lengths, k: int, threshold, mesh
):
    fn = jax.shard_map(
        lambda k2, c2, co, le, th: matches_pipeline_core(
            k2, c2, co, le, k, th
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P()),
        out_specs=P("data"),
        # pallas_call out_shapes carry no varying-mesh-axes annotation;
        # per-shard computation is manifestly data-parallel here
        check_vma=False,
    )
    return fn(keys2, cap2, codes, lengths, threshold)


def matches_batch_sharded(
    index: SbwtIndex,
    code_list: list[np.ndarray],
    threshold: int,
    mesh: Mesh | None = None,
):
    """Data-parallel batched matches over all devices of a mesh.

    Pads Q to a multiple of the mesh size; results return in input order.
    """
    mesh = mesh or make_mesh()
    n = mesh.devices.size
    codes, lengths = pad_batch(code_list)
    Q, L = codes.shape
    Qp = ((Q + n - 1) // n) * n
    if Qp != Q:
        codes = np.pad(codes, ((0, Qp - Q), (0, 0)), constant_values=INVALID)
        lengths = np.pad(lengths, (0, Qp - Q))

    from kbo_tpu.engine import device_index
    from kbo_tpu.parallel.distributed import gather_to_host

    dev = device_index(index)
    chars, ms = _sharded_matches(
        put_global(mesh, P(), dev.keys2),
        put_global(mesh, P(), dev.cap2),
        put_global(mesh, P("data"), codes),
        put_global(mesh, P("data"), lengths),
        dev.k,
        jnp.int32(threshold),
        mesh,
    )
    chars = gather_to_host(chars.astype(jnp.int32)).astype(np.uint8)
    return [chars[i, : c.size] for i, c in enumerate(code_list)]


@functools.partial(jax.jit, static_argnames=("cap", "mesh"))
def _sharded_rle(chars, lengths, cap: int, mesh):
    from kbo_tpu.kernels.postprocess import rle_segments_core

    fn = jax.shard_map(
        lambda c, le: rle_segments_core(c, le, cap),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(chars, lengths)


@functools.partial(jax.jit, static_argnames=("cap_total", "mesh"))
def _sharded_rle_global(chars, lengths, cap_total: int, mesh):
    """Per-shard GLOBAL segment tables (kernels.postprocess
    rle_segments_global_core): each shard emits one flat
    [1 + Qs + 5*cap_total] vector; the data-axis concat of those is the
    whole fetch."""
    from kbo_tpu.kernels.postprocess import rle_segments_global_core

    fn = jax.shard_map(
        lambda c, le: rle_segments_global_core(c, le, cap_total)[None, :],
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(chars, lengths)


def find_rle_batch_sharded(
    index: SbwtIndex,
    code_list: list[np.ndarray],
    threshold: int,
    mesh: Mesh | None = None,
):
    """Data-parallel batched find with DEVICE RLE extraction: the sharded
    matches pipeline's [Q, L] chars stay on their devices and a per-shard
    segmentation kernel (kernels.postprocess.rle_segments_core) reduces
    them to a [Q, 1 + 5*cap] int32 table -- the only thing fetched.

    This unbottlenecks the serving/scaling path from the host link: the
    replicated-path equivalent (pipeline.find_rle_batch) measured the full
    chars download at ~2 MB/call through the relay vs ~10 KB for the
    segment table (BASELINE.md round-3 scaling captures).
    """
    mesh = mesh or make_mesh()
    n = mesh.devices.size
    codes, lengths = pad_batch(code_list, bucket=True)
    Q, L = codes.shape
    Qp = ((Q + n - 1) // n) * n
    if Qp != Q:
        codes = np.pad(codes, ((0, Qp - Q), (0, 0)), constant_values=INVALID)
        lengths = np.pad(lengths, (0, Qp - Q))

    from kbo_tpu.engine import device_index
    from kbo_tpu.pipeline import (
        _bucket,
        decode_packed_codes_device,
        pack_codes_host,
    )

    dev = device_index(index)
    lengths_dev = put_global(mesh, P("data"), lengths)
    # 2-bit-packed query upload: the raw [Q, L] batch is the serving
    # path's dominant transfer through a remote host link (2 MB for
    # 512 x 4096 vs the ~10 KB segment fetch); clean ACGT batches ship
    # packed and decode on their shards (elementwise: sharding follows)
    import os

    packed = (
        pack_codes_host(codes, lengths)
        if os.environ.get("KBO_TPU_PACK_QUERIES", "1") != "0"
        else None
    )
    if packed is not None:
        codes_dev = jax.device_put(
            decode_packed_codes_device(
                put_global(mesh, P("data"), packed), lengths_dev
            ),
            NamedSharding(mesh, P("data")),
        )
    else:
        codes_dev = put_global(mesh, P("data"), codes)
    chars, _ms = _sharded_matches(
        put_global(mesh, P(), dev.keys2),
        put_global(mesh, P(), dev.cap2),
        codes_dev,
        lengths_dev,
        dev.k,
        jnp.int32(threshold),
        mesh,
    )
    q_per = Qp // n
    cap = _bucket(max(128, 2 * q_per), lo=128)
    while True:
        from kbo_tpu.parallel.distributed import gather_to_host
        from kbo_tpu.pipeline import _rle_structs_global

        blocks = gather_to_host(
            _sharded_rle_global(chars, lengths_dev, cap, mesh)
        )
        rows: list | None = []
        for s in range(n):
            part = _rle_structs_global(blocks[s], q_per, cap)
            if part is None:
                rows = None
                break
            rows.extend(part)
        if rows is not None:
            return rows[: len(code_list)]
        cap = min(cap * 4, q_per * ((L + 1) // 2 + 1))


def matches_long_sharded(
    index: SbwtIndex,
    codes: np.ndarray,
    threshold: int,
    mesh: Mesh | None = None,
):
    """Sequence-parallel fused pipeline over ONE long query.

    The reference streams sequentially (O(1)-state walk); here every MS
    value depends only on its k-window, and the derandomize/translate
    recurrences only propagate information within k + threshold + 2
    positions of a reset, so splitting the sequence into per-device chunks
    with a halo of that size is EXACT (SURVEY §5 "long-context /
    sequence parallelism"). Each device runs the fused
    MS -> derandomize -> translate pipeline on its chunk + halo and the
    halo is trimmed on the way out.

    Returns (chars uint8 [L], ms int64 [L]).
    """
    mesh = mesh or make_mesh()
    n = mesh.devices.size
    codes = np.asarray(codes, dtype=np.uint8)
    L = codes.size
    k = index.k
    halo = k + int(threshold) + 2
    chunk = (L + n - 1) // n
    assert chunk > halo, (
        f"sequence of {L} too short to shard {n} ways with halo {halo}"
    )
    # per-shard rows: [chunk + 2*halo] tail-padded with INVALID. Shard 0
    # starts AT the sequence start (no left pad) so translate's
    # position-0/1 special case (prev = k, reference src/translate.rs:277)
    # applies to the true sequence start, not a pad position.
    width = chunk + 2 * halo
    rows = np.full((n, width), INVALID, dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    offs = np.zeros(n, dtype=np.int64)  # row index of position i*chunk
    for i in range(n):
        s = i * chunk
        lo = max(0, s - halo)
        # ceil-division chunking can push trailing shards past the end
        # (s >= L when n*chunk - L >= chunk); clamp so hi >= lo and the
        # output loop below emits nothing for them
        hi = max(min(L, s + chunk + halo), lo)
        rows[i, : hi - lo] = codes[lo:hi]
        lengths[i] = hi - lo
        offs[i] = s - lo

    from kbo_tpu.engine import device_index
    from kbo_tpu.parallel.distributed import gather_to_host

    dev = device_index(index)
    chars, ms = _sharded_matches(
        put_global(mesh, P(), dev.keys2),
        put_global(mesh, P(), dev.cap2),
        put_global(mesh, P("data"), rows),
        put_global(mesh, P("data"), lengths),
        dev.k,
        jnp.int32(threshold),
        mesh,
    )
    chars = gather_to_host(chars.astype(jnp.int32)).astype(np.uint8)
    ms = gather_to_host(ms).astype(np.int64)
    out_chars = np.empty(L, dtype=np.uint8)
    out_ms = np.empty(L, dtype=np.int64)
    for i in range(n):
        s = i * chunk
        e = min(L, s + chunk)
        if e <= s:  # trailing shard entirely past the end
            continue
        off = int(offs[i])
        out_chars[s:e] = chars[i, off : off + (e - s)]
        out_ms[s:e] = ms[i, off : off + (e - s)]
    return out_chars, out_ms


# ------------------------------------------------- sharded map (sparse path)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_map_sweep(keys2, cap2, codes, lengths, k: int, threshold, mesh):
    from kbo_tpu.kernels.mapsweep import map_sweep_compact_core

    fn = jax.shard_map(
        lambda k2, c2, co, le, th: map_sweep_compact_core(
            k2, c2, co, le, k, th
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P()),
        out_specs=(
            P("data"), P("data"), P("data"), P("data"), P("data"), P("data")
        ),
        check_vma=False,
    )
    return fn(keys2, cap2, codes, lengths, threshold)


def map_sweep_compact_sharded(dev, codes, lengths, threshold, mesh: Mesh):
    """Data-parallel fused map sweep + candidate compaction over a mesh.

    Contigs shard over the ``data`` axis (replicated index tables); the
    compaction is row-local, so per-shard outputs concatenate in input
    order -- bit-identical to the single-device sweep. The caller must pad
    the contig batch to a multiple of the mesh size.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    codes_dev = jax.device_put(jnp.asarray(codes), shard)
    return codes_dev, _sharded_map_sweep(
        jax.device_put(dev.keys2, repl),
        jax.device_put(dev.cap2, repl),
        codes_dev,
        jax.device_put(jnp.asarray(lengths), shard),
        dev.k,
        jnp.int32(threshold),
        mesh,
    )


# ------------------------------------------- prefix-sharded index placement


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _index_sharded_matches(keys2, cap2, codes, lengths, k: int, threshold,
                           mesh):
    """Queries replicated, the key TABLE sharded over the ``model`` axis.

    Each device holds a contiguous colex range of the sorted join keys (=
    a k-mer prefix range in colex order) and computes the clamped-LCP
    neighbor-best of every query position against ITS rows only; the true
    MS value is the elementwise maximum across shards (`psum`-style
    tree reduction via lax.pmax over ICI) -- exact because the global
    best neighbor lives in exactly one shard and clamping commutes with
    max. Derandomize/translate then run on the reduced values (replicated
    work, one sequence's worth per device).
    """
    from kbo_tpu.kernels.ms import ms2_core
    from kbo_tpu.kernels.postprocess import derandomize_core, translate_core

    def shardfn(k2, c2, co, le, th):
        Q, L = co.shape
        pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
        buf = jnp.concatenate([pad, co], axis=1).reshape(-1)
        stride = L + k - 1
        ms_local = ms2_core(k2, c2, buf, k).reshape(Q, stride)[:, k - 1 :]
        ms = jax.lax.pmax(ms_local, "model")
        derand = jax.vmap(
            lambda m, n: derandomize_core(m, k, th, n)
        )(ms, le)
        chars = jax.vmap(lambda d, n: translate_core(d, k, th, n))(derand, le)
        return chars, ms

    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=(P(None, "model"), P("model"), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(keys2, cap2, codes, lengths, threshold)


def matches_batch_index_sharded(
    index: SbwtIndex,
    code_list: list[np.ndarray],
    threshold: int,
    mesh: Mesh | None = None,
):
    """Batched matches with PREFIX-SHARDED index placement (SURVEY §2.3
    row 2's larger-than-HBM alternative): the colex-sorted key table
    splits into contiguous per-device ranges, so each device stores
    1/n of the index; queries replicate and per-shard partial MS values
    reduce with one `pmax` collective. Output is bit-identical to the
    replicated path (tests/test_parallel.py pins it).
    """
    mesh = mesh or make_mesh(axis="model")
    axis = mesh.axis_names[0]
    assert axis == "model", "index sharding expects a 'model' mesh axis"
    n = mesh.devices.size
    codes, lengths = pad_batch(code_list)

    # shard straight from the HOST arrays: replication via device_index
    # would rebuild (or upload) the full tables per device, and pulling
    # device-resident tables back is the relay bulk-fetch pathology
    assert index.keys2 is not None, "index built without join keys"
    rows = int(index.keys2.shape[1])
    rows_p = ((rows + n - 1) // n) * n
    keys2 = np.ascontiguousarray(index.keys2)
    cap2 = np.ascontiguousarray(index.cap2)
    if rows_p != rows:
        # sentinel-pad to an even split: cap-0 rows contribute nothing to
        # the clamped-LCP scan (the DeviceFullIndex convention)
        keys2 = np.pad(
            keys2, ((0, 0), (0, rows_p - rows)), constant_values=0xFFFFFFFF
        )
        cap2 = np.pad(cap2, (0, rows_p - rows))
    chars, ms = _index_sharded_matches(
        put_global(mesh, P(None, "model"), keys2),
        put_global(mesh, P("model"), cap2),
        put_global(mesh, P(), codes),
        put_global(mesh, P(), lengths),
        int(index.k),
        jnp.int32(threshold),
        mesh,
    )
    chars = np.asarray(chars).astype(np.uint8)
    return [chars[i, : c.size] for i, c in enumerate(code_list)]


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_ms2_batch(keys2, cap2, buf2d, k: int, mesh):
    from kbo_tpu.kernels.ms import ms2_core

    fn = jax.shard_map(
        lambda k2, c2, b: ms2_core(k2, c2, b.reshape(-1), k).reshape(
            b.shape
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(keys2, cap2, buf2d)


def ms_values_many_sharded(
    index: SbwtIndex, code_list: list[np.ndarray], mesh: Mesh
):
    """Data-parallel batched short-query MS (the variant caller's
    per-candidate k-mer re-runs, sharded over the ``data`` axis)."""
    from kbo_tpu.engine import device_index
    from kbo_tpu.kernels.ms import INVALID as _INV

    dev = device_index(index)
    k = dev.k
    codes, _ = pad_batch(code_list)
    Q, L = codes.shape
    n = mesh.devices.size
    Qp = ((Q + n - 1) // n) * n
    if Qp != Q:
        codes = np.pad(codes, ((0, Qp - Q), (0, 0)), constant_values=_INV)
    buf = np.concatenate(
        [np.full((Qp, k - 1), _INV, np.uint8), codes], axis=1
    )
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    ms = _sharded_ms2_batch(
        jax.device_put(dev.keys2, repl),
        jax.device_put(dev.cap2, repl),
        jax.device_put(jnp.asarray(buf), shard),
        k,
        mesh,
    )
    ms = np.asarray(ms[:, k - 1 :], dtype=np.int64)
    return [ms[i, : c.size] for i, c in enumerate(code_list)]


# --------------------------- prefix-sharded index placement: the 3-bit path


class Sharded3Index:
    """The 3-bit join tables of an index, prefix-sharded over a ``model``
    mesh axis (SURVEY §2.3 row 2's larger-than-HBM placement, extended to
    the map/call path): each device holds a contiguous colex row range of
    ``keys3`` plus the GLOBAL adjacent-row LCS values for its rows, so no
    device ever materializes the full table. The full devref map pipeline
    runs against it (kernels/refine.py collectives: packed-pmax rows join,
    psum row unpacking, OR-reduced membership probes).
    """

    def __init__(self, index: SbwtIndex, mesh: Mesh):
        assert "model" in mesh.axis_names, "expects a 'model' mesh axis"
        assert index.keys3 is not None, "index built without join keys"
        n_dev = mesh.devices.size
        keys3 = np.ascontiguousarray(index.keys3)
        W, n = keys3.shape
        m = ((n + n_dev - 1) // n_dev) * n_dev
        if m != n:
            keys3 = np.pad(
                keys3, ((0, 0), (0, m - n)), constant_values=0xFFFFFFFF
            )
        lcs = np.asarray(index.lcs, dtype=np.uint32)[:n]
        down = np.zeros(m, dtype=np.uint32)
        down[:n] = lcs
        up = np.zeros(m, dtype=np.uint32)
        up[: n - 1] = lcs[1:]
        self.keys3 = put_global(mesh, P(None, "model"), keys3)
        self.down = put_global(mesh, P("model"), down)
        self.up = put_global(mesh, P("model"), up)
        self.n_rows = int(index.n_rows)
        self.k = int(index.k)
        self.model_mesh = mesh


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_rows_join(keys3, down, up, codes, k: int, mesh):
    from kbo_tpu.kernels.ms import (
        ms3_rows_from_packed,
        ms3_rows_partial_core,
    )

    def shardfn(k3, dn, upv, co):
        Q, L = co.shape
        pad = jnp.full((Q, k - 1), INVALID, jnp.uint8)
        buf = jnp.concatenate([pad, co], axis=1).reshape(-1)
        m = k3.shape[1]
        offset = jax.lax.axis_index("model").astype(jnp.int32) * jnp.int32(m)
        fp, bp = ms3_rows_partial_core(k3, dn, upv, offset, buf, k)
        return jax.lax.pmax(fp, "model"), jax.lax.pmax(bp, "model")

    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=(P(None, "model"), P("model"), P("model"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(keys3, down, up, codes)


def ms3_rows_sweep_index_sharded(sidx: Sharded3Index, codes, mesh: Mesh):
    """(ms, uniq, rows) for a [Q, L] batch against the SHARDED key table:
    per-shard packed halves reduced with one pmax pair, finished
    replicated. Bit-identical to kernels.mapsweep.ms3_rows_sweep."""
    from kbo_tpu.kernels.ms import ms3_rows_from_packed

    k = sidx.k
    Q, L = codes.shape
    fp, bp = _sharded_rows_join(
        sidx.keys3, sidx.down, sidx.up, jnp.asarray(codes), k, mesh
    )
    ms, uniq, rows = ms3_rows_from_packed(fp, bp, jnp.int32(sidx.n_rows), k)
    stride = L + k - 1
    return (
        ms.reshape(Q, stride)[:, k - 1 :],
        uniq.reshape(Q, stride)[:, k - 1 :],
        rows.reshape(Q, stride)[:, k - 1 :],
    )


@functools.partial(
    jax.jit, static_argnames=("k", "cap_d", "mesh", "d_lo")
)
def sharded_resolve_variants(
    keys3, seq_words, codes, ref_mat, ms, lengths, drop_pos, apos, arow,
    d, k: int, cap_d: int, mesh, d_lo: int = 0,
):
    """kernels.refine.resolve_variants with the key table prefix-sharded:
    the reference-k-mer unpack contributes per shard and psums; the
    rk-vs-sequence join replicates (it joins against the SEQUENCE keys,
    not the index)."""
    from kbo_tpu.kernels.refine import resolve_variants_core

    def shardfn(k3, sw, co, rm, m_, le, dp, ap, ar, dd):
        return resolve_variants_core(
            k3, sw, co, rm, m_, le, dp, ap, ar, dd, k, cap_d, axis="model",
            d_lo=d_lo,
        )

    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=(
            P(None, "model"), P(), P(), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(
        keys3, seq_words, codes, ref_mat, ms, lengths, drop_pos, apos,
        arow, d,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "cap_ge", "cap_ext", "mesh")
)
def sharded_score_gaps(
    keys3, ref_mat, lengths, gap_start, gap_end_at, grid, threshold,
    bound, k: int, cap_ge: int, cap_ext: int, mesh,
):
    """kernels.refine.score_gaps with the key table prefix-sharded: the
    candidate k-mer unpack psums per-shard contributions and the left
    extension's membership binary searches OR-reduce across shards."""
    from kbo_tpu.kernels.refine import score_gaps_core

    def shardfn(k3, rm, le, gs, ge, gr, th, bd):
        return score_gaps_core(
            k3, rm, le, gs, ge, gr, th, k, cap_ge, cap_ext, axis="model",
            bound=bd,
        )

    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=(P(None, "model"), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return fn(
        keys3, ref_mat, lengths, gap_start, gap_end_at, grid, threshold,
        jnp.asarray(bound),
    )


# --------------------------------------------- sequence-sharded map path
#
# The flagship `kbo map` workload is ONE multi-megabase pair
# (/root/reference/src/lib.rs:720-761); contig-granular data parallelism
# cannot split it. This path places POSITION CHUNKS of a single genome on
# the ``data`` axis instead:
#
#   stage 1  the 3-bit rows join runs per chunk with k-1 real left context
#            (exact -- the decomposition kernels.mapsweep.
#            ms3_rows_sweep_chunked proves, here spatial instead of
#            serial), and the dense (ms, uniq, rows) all_gather back;
#   stage 2  derandomize/translate/candidate compaction replicate (the
#            derandomize scan and gap runs cross chunk boundaries; a
#            replicated run costs one device's worth of wall time);
#   stage 3  gap scoring shards over CANDIDATE SLOTS (each gap's math is
#            slot-local) and the variant resolver's rk-vs-sequence join
#            shards over the SEQUENCE chunks (per-shard tagged window
#            keys, per-probe best pmax-reduced -- see
#            kernels.refine.resolve_variants_core);
#   stage 4  priority assembly + the single delta fetch replicate.


@functools.partial(jax.jit, static_argnames=("k", "L", "mesh"))
def _seqsh_stage1(keys3, lcs3, ctx_chunks, k: int, L: int, mesh):
    """Position-sharded 3-bit rows join: ctx_chunks [nd, Q, (k-1)+chunk]
    holds each shard's chunk with its k-1 real left-context codes
    (INVALID for shard 0, matching the unchunked buffer head). Returns
    REPLICATED dense (ms, uniq, rows) [Q, L]."""
    from kbo_tpu.kernels.ms import ms3_rows_core

    def shardfn(k3, l3, cc):
        cc0 = cc[0]
        Q, W0 = cc0.shape
        m, u, r = ms3_rows_core(k3, l3, cc0.reshape(-1), k)

        def fin(x):
            x = x.reshape(Q, W0)[:, k - 1 :]
            g = jax.lax.all_gather(x, "data")  # [nd, Q, chunk]
            return jnp.transpose(g, (1, 0, 2)).reshape(Q, -1)[:, :L]

        return fin(m), fin(u), fin(r)

    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(keys3, lcs3, ctx_chunks)


@functools.partial(
    jax.jit, static_argnames=("k", "cap_d", "cap_g", "w_grid", "mesh")
)
def _repl_postprocess3(
    ms, uniq, rows, lengths, threshold, k: int, cap_d: int, cap_g: int,
    w_grid: int, mesh,
):
    """map_postprocess3 with explicitly REPLICATED placement on a mesh
    (every device computes the identical full-contig postprocess; shard_map
    with all-replicated specs pins the layout so downstream shard_maps pay
    no resharding)."""
    from kbo_tpu.kernels.mapsweep import map_postprocess3_core

    fn = jax.shard_map(
        lambda m, u, r, le, th: map_postprocess3_core(
            m, u, r, le, k, th, cap_d, cap_g, w_grid
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(ms, uniq, rows, lengths, threshold)


@functools.partial(
    jax.jit, static_argnames=("k", "cap_g", "cap_ext", "mesh")
)
def seqsh_score_gaps(
    keys3, ref_mat, lengths, gap_start, gap_end_at, grid, threshold,
    bound, k: int, cap_g: int, cap_ext: int, mesh, ext_w=None, ext_l=None,
):
    """kernels.refine.score_gaps sharded over CANDIDATE SLOTS: each device
    scores cap_g/nd of the compacted gap runs (slot math is gap-local;
    the key table and reference replicate). Patch grids all_gather (their
    order is irrelevant to the scatter-max assembly), ``needs_host`` is
    re-laid out to the global [Q*cap_g] slot order, counters psum."""
    from kbo_tpu.kernels.refine import score_gaps_core

    nd = mesh.shape["data"]
    Q = gap_start.shape[0]
    capp = ((cap_g + nd - 1) // nd) * nd
    if capp != cap_g:
        pad = capp - cap_g
        big = jnp.int32(2**31 - 1)
        gap_start = jnp.pad(
            gap_start[:, :cap_g], ((0, 0), (0, pad)), constant_values=big
        )
        gap_end_at = jnp.pad(
            gap_end_at[:, :cap_g], ((0, 0), (0, pad)), constant_values=big
        )
        grid = jnp.pad(
            grid[:, :cap_g], ((0, 0), (0, pad), (0, 0)), constant_values=-1
        )
    cap_gl = capp // nd
    has_ext = ext_w is not None

    def shardfn(k3, rm, le, gs, ge, gr, th, bd, *ext):
        gpos, gpv, nh, gc = score_gaps_core(
            k3, rm, le, gs, ge, gr, th, k, cap_gl, cap_ext,
            ext_tab=(ext if has_ext else None), bound=bd,
        )
        gpos = jax.lax.all_gather(gpos, "data").reshape(-1, gpos.shape[-1])
        gpv = jax.lax.all_gather(gpv, "data").reshape(-1, gpv.shape[-1])
        nh = (
            jnp.transpose(
                jax.lax.all_gather(nh.reshape(Q, cap_gl), "data"), (1, 0, 2)
            )
            .reshape(Q, capp)[:, :cap_g]
            .reshape(-1)
        )
        return gpos, gpv, nh, jax.lax.psum(gc, "data")

    in_specs = [
        P(), P(), P(), P(None, "data"), P(None, "data"),
        P(None, "data", None), P(), P(),
    ]
    args = [
        keys3, ref_mat, lengths, gap_start, gap_end_at, grid, threshold,
        jnp.asarray(bound),
    ]
    if has_ext:
        in_specs += [P(), P()]
        args += [ext_w, ext_l]
    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return fn(*args)


@functools.partial(jax.jit, static_argnames=("k", "cap_d", "d_lo", "mesh"))
def seqsh_resolve_variants(
    keys3, ctx_chunks, codes, ref_mat, ms, lengths, drop_pos, apos, arow,
    d, k: int, cap_d: int, mesh, d_lo: int = 0,
):
    """kernels.refine.resolve_variants with the rk-vs-sequence join table
    SEQUENCE-SHARDED: each shard sorts only its chunk's tagged window keys
    (built from chunk + k-1 real context) and the per-probe best reduces
    with one pmax (exact -- every true window is owned by one shard;
    context-region duplicates can only score lower). The slot math runs
    replicated over the dense gathered arrays."""
    from kbo_tpu.kernels.refine import (
        resolve_variants_core,
        seq_keys3_tagged_core,
    )

    def shardfn(k3, cc, co, rm, m_, le, dp, ap, ar, dd):
        sw = seq_keys3_tagged_core(cc[0], k)
        return resolve_variants_core(
            k3, sw, co, rm, m_, le, dp, ap, ar, dd, k, cap_d,
            d_lo=d_lo, seq_axis="data",
        )

    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=(
            P(), P("data"), P(), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(
        keys3, ctx_chunks, codes, ref_mat, ms, lengths, drop_pos, apos,
        arow, d,
    )


class _SeqShardedDev:
    """Per-(index, mesh) holder consumed by refine.device_map.
    map_devref_finish's sequence-sharded branch: replicated key table +
    the sharded context chunks. ``_ext_table`` caches the extension-chain
    table (kernels.refine.get_ext_table) on the mesh."""

    def __init__(self, keys3, lcs3, k: int, mesh: Mesh):
        self.keys3 = keys3
        self.lcs3 = lcs3
        self.k = k
        self.seq_mesh = mesh
        self.ctx_chunks = None  # set per call (shapes vary with L)


def _seqsh_holder(query_sbwt: SbwtIndex, mesh: Mesh) -> _SeqShardedDev:
    from kbo_tpu import engine

    cache = getattr(query_sbwt, "_seqsh_cache", None)
    if cache is None:
        cache = {}
        query_sbwt._seqsh_cache = cache
    # key by the mesh VALUE (devices + axis names): meshes compare by
    # content, and an id() key could alias a dead mesh after GC reuse
    key = mesh
    holder = cache.get(key)
    if holder is None:
        dev = engine.device_index(query_sbwt)
        repl = NamedSharding(mesh, P())
        holder = _SeqShardedDev(
            jax.device_put(dev.keys3, repl),
            jax.device_put(dev.lcs3, repl),
            dev.k,
            mesh,
        )
        cache[key] = holder
    return holder


def map_seq_sharded(
    ref_seqs: list[bytes],
    query_sbwt: SbwtIndex,
    map_opts=None,
    mesh: Mesh | None = None,
    code_list=None,
) -> list[bytes]:
    """Batched ``map_`` with the SEQUENCE position-sharded over a ``data``
    mesh: one genome uses every device (the contig-granular
    refine.device_map.map_devref_data_sharded cannot split the flagship
    single-pair workload, /root/reference/src/lib.rs:720-761). Runs the
    same single-fetch devref pipeline and is pinned bit-identical to the
    single-device path (tests/test_mesh_map.py)."""
    from kbo_tpu.kernels.refine import max_tag
    from kbo_tpu.ops import derandomize
    from kbo_tpu.opts import MapOpts
    from kbo_tpu.refine.device_map import DevRefOverflow, map_devref_finish
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.utils.stats import stage

    opts = map_opts or MapOpts()
    if not ref_seqs:
        return []
    mesh = mesh or make_mesh()
    assert "data" in mesh.axis_names, "expects a 'data' mesh axis"
    nd = mesh.shape["data"]
    k = query_sbwt.k
    if opts.call_variants:
        assert k == opts.sbwt_build_opts.k
        assert not opts.sbwt_build_opts.add_revcomp, (
            "the sharded devref path carries the forward text only"
        )
    threshold = derandomize.random_match_threshold(
        k, query_sbwt.n_kmers, 4, opts.max_error_prob
    )
    if code_list is None:
        code_list = [encode_ascii(bytes(r)) for r in ref_seqs]
    codes, lengths = pad_batch(code_list, bucket=True)
    Q, L = codes.shape
    assert Q <= max_tag(k), (
        f"{Q} contigs exceed the {max_tag(k)}-contig tag capacity at k={k}"
    )
    assert Q * L < 2**31
    chunk = -(-L // nd)
    assert chunk >= k, (
        f"sequence of {L} too short to position-shard {nd} ways at k={k}"
    )

    # host prep: per-shard chunk + k-1 real left context (INVALID for
    # shard 0 = the unchunked buffer head; INVALID tail pad)
    W0 = (k - 1) + chunk
    cc = np.full((nd, Q, W0), INVALID, dtype=np.uint8)
    for s in range(nd):
        lo = s * chunk
        if lo >= L:
            continue
        c0 = max(0, lo - (k - 1))
        seg = codes[:, c0 : min(L, lo + chunk)]
        off = (k - 1) - (lo - c0)
        cc[s, :, off : off + seg.shape[1]] = seg

    ref_mat = np.zeros((Q, L), dtype=np.uint8)
    for q, r in enumerate(ref_seqs):
        ref_mat[q, : len(r)] = np.frombuffer(bytes(r), dtype=np.uint8)

    holder = _seqsh_holder(query_sbwt, mesh)
    repl = NamedSharding(mesh, P())
    holder.ctx_chunks = put_global(mesh, P("data"), cc)
    codes_dev = put_global(mesh, P(), codes)
    lengths_dev = put_global(mesh, P(), lengths)
    ref_mat_dev = jax.device_put(jnp.asarray(ref_mat), repl)

    def _pow2_cap(n, lo=256):
        c = lo
        while c < n:
            c <<= 1
        return c

    with stage("map_sweep", bases=sum(c.size for c in code_list)):
        ms_dev, uniq_dev, rows_dev = _seqsh_stage1(
            holder.keys3, holder.lcs3, holder.ctx_chunks, k=k, L=L,
            mesh=mesh,
        )
        cap_d = _pow2_cap(L // 1024)
        cap_g = _pow2_cap(L // 1536, lo=256)
        while True:
            chars_dev, packed_dev, pieces = _repl_postprocess3(
                ms_dev, uniq_dev, rows_dev, lengths_dev,
                jnp.int32(threshold), k=k, cap_d=cap_d, cap_g=cap_g,
                w_grid=max(k - threshold + 1, 1), mesh=mesh,
            )
            try:
                return map_devref_finish(
                    holder, codes_dev, lengths_dev, ms_dev, chars_dev,
                    pieces, packed_dev, ref_seqs, query_sbwt, code_list,
                    opts, threshold, cap_d, cap_g,
                    total_gap_slack=cap_g * 2 + 64,
                    ref_mat=ref_mat, ref_mat_dev=ref_mat_dev,
                )
            except DevRefOverflow as o:
                cap_d = _pow2_cap(o.need_d)
                cap_g = _pow2_cap(o.need_g)


def map_batch_index_sharded(
    ref_seqs: list[bytes],
    query_sbwt: SbwtIndex,
    map_opts=None,
    mesh: Mesh | None = None,
) -> list[bytes]:
    """Batched ``map_`` with the 3-bit index tables PREFIX-SHARDED over a
    ``model`` mesh (the larger-than-HBM placement for the map/call path;
    `find` has :func:`matches_batch_index_sharded`). Runs the same
    single-fetch devref pipeline as the replicated path -- stage-1 join
    via packed pmax halves, refinement via the shard_map collectives --
    and is pinned bit-identical to it (tests/test_index_sharded_map.py).
    """
    import os

    from kbo_tpu.kernels.mapsweep import map_postprocess3
    from kbo_tpu.kernels.refine import max_tag
    from kbo_tpu.ops import derandomize
    from kbo_tpu.opts import MapOpts
    from kbo_tpu.refine.device_map import DevRefOverflow, map_devref_finish
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.utils.stats import stage

    opts = map_opts or MapOpts()
    if not ref_seqs:
        return []
    mesh = mesh or make_mesh(axis="model")
    k = query_sbwt.k
    if opts.call_variants:
        assert k == opts.sbwt_build_opts.k
        assert not opts.sbwt_build_opts.add_revcomp, (
            "the sharded devref path carries the forward text only"
        )
    threshold = derandomize.random_match_threshold(
        k, query_sbwt.n_kmers, 4, opts.max_error_prob
    )
    sidx = Sharded3Index(query_sbwt, mesh)
    code_list = [encode_ascii(bytes(r)) for r in ref_seqs]
    codes, lengths = pad_batch(code_list, bucket=True)
    Q, L = codes.shape
    assert Q <= max_tag(k), (
        f"{Q} contigs exceed the {max_tag(k)}-contig tag capacity at k={k}"
    )
    assert Q * L < 2**31

    def _pow2_cap(n, lo=256):
        c = lo
        while c < n:
            c <<= 1
        return c

    with stage("map_sweep", bases=sum(c.size for c in code_list)):
        codes_dev = put_global(mesh, P(), codes)
        lengths_dev = put_global(mesh, P(), lengths)
        ms_dev, uniq_dev, rows_dev = ms3_rows_sweep_index_sharded(
            sidx, codes_dev, mesh
        )
        cap_d = cap_g = _pow2_cap(L // 512)
        while True:
            chars_dev, packed_dev, pieces = map_postprocess3(
                ms_dev, uniq_dev, rows_dev, lengths_dev, k,
                jnp.int32(threshold), cap_d, cap_g,
                max(k - threshold + 1, 1),
            )
            try:
                return map_devref_finish(
                    sidx, codes_dev, lengths_dev, ms_dev, chars_dev,
                    pieces, packed_dev, ref_seqs, query_sbwt, code_list,
                    opts, threshold, cap_d, cap_g,
                    total_gap_slack=cap_g * 2 + 64,
                )
            except DevRefOverflow as o:
                cap_d = _pow2_cap(o.need_d)
                cap_g = _pow2_cap(o.need_g)


# ----------------------------- 2D placement: data x model simultaneously


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _stage1_2d(keys3, down, up, n_rows, codes, k: int, mesh):
    """Dense (ms, uniq, rows) with the BATCH sharded over ``data`` AND the
    key table prefix-sharded over ``model``: each (data, model) device
    joins its contig block against its colex range; the packed halves
    pmax-reduce over ``model`` only."""
    from kbo_tpu.kernels.ms import (
        ms3_rows_from_packed,
        ms3_rows_partial_core,
    )

    def shardfn(k3, dn, upv, nr, co):
        Qs, Ls = co.shape
        pad = jnp.full((Qs, k - 1), INVALID, jnp.uint8)
        buf = jnp.concatenate([pad, co], axis=1).reshape(-1)
        m = k3.shape[1]
        offset = jax.lax.axis_index("model").astype(jnp.int32) * jnp.int32(m)
        fp, bp = ms3_rows_partial_core(k3, dn, upv, offset, buf, k)
        fp = jax.lax.pmax(fp, "model")
        bp = jax.lax.pmax(bp, "model")
        ms, uniq, rows = ms3_rows_from_packed(fp, bp, nr, k)
        stride = Ls + k - 1
        return (
            ms.reshape(Qs, stride)[:, k - 1 :],
            uniq.reshape(Qs, stride)[:, k - 1 :],
            rows.reshape(Qs, stride)[:, k - 1 :],
        )

    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=(
            P(None, "model"), P("model"), P("model"), P(), P("data"),
        ),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )
    return fn(keys3, down, up, n_rows, codes)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kk", "cd", "cg", "ce", "cr", "dg", "dv", "fm", "mesh", "dl", "wg",
    ),
)
def _stage2_2d(k3, co, rm, le, m_, u_, r_, th, bd, kk: int, cd: int,
               cg: int, ce: int, cr: int, dg: bool, dv: bool, fm: bool,
               mesh, dl: int = 0, wg: int | None = None):
    """The fused post-sweep refinement per data shard with the key table
    model-sharded: refine.device_map.devref_core runs with axis="model"
    (row unpacking psums, membership probes OR-reduce; the left extension
    uses the sharded search loop -- the chain table needs the full
    table)."""
    from kbo_tpu.refine.device_map import devref_core

    def shardfn(k3s, cos, rms, les, ms_, us, rs_, ths, bds):
        return devref_core(
            k3s, cos, rms, les, ms_, us, rs_, ths,
            kk, cd, cg, ce, cr, dg, dv, fm, d_lo=dl, w_grid=wg,
            ext_tab=None, bound=bds, axis="model",
        )

    fn = jax.shard_map(
        shardfn,
        mesh=mesh,
        in_specs=(
            P(None, "model"), P("data"), P("data"), P("data"),
            P("data"), P("data"), P("data"), P(), P(),
        ),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return fn(k3, co, rm, le, m_, u_, r_, th, bd)


def map_batch_2d_sharded(
    ref_seqs: list[bytes],
    query_sbwt: SbwtIndex,
    map_opts=None,
    mesh: Mesh | None = None,
) -> list[bytes]:
    """Batched ``map_`` over a 2D (data x model) mesh: the contig batch
    shards over ``data`` while the 3-bit key table prefix-shards over
    ``model`` -- the realistic big-batch x big-index 8-chip deployment
    (SURVEY 2.3; round-4 verdict missing #3), where neither the batch nor
    the index fits one device. Bit-identical to the single-device path
    (tests/test_index_sharded_map.py). Returns None when a gap needs the
    exact host evaluator (callers degrade to a 1D path)."""
    import math as _math

    from kbo_tpu.kernels.refine import max_tag, prob_bound
    from kbo_tpu.ops import derandomize
    from kbo_tpu.opts import MapOpts
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.refine.device_map import _canvas, _paint_runs
    from kbo_tpu.utils.stats import get_stats, stage

    opts = map_opts or MapOpts()
    if not ref_seqs:
        return []
    assert mesh is not None and {"data", "model"} <= set(mesh.axis_names)
    k = query_sbwt.k
    if opts.call_variants:
        assert k == opts.sbwt_build_opts.k
        assert not opts.sbwt_build_opts.add_revcomp
    threshold = derandomize.random_match_threshold(
        k, query_sbwt.n_kmers, 4, opts.max_error_prob
    )
    sidx = Sharded3Index(query_sbwt, mesh)
    code_list = [encode_ascii(bytes(r)) for r in ref_seqs]
    codes, lengths = pad_batch(code_list, bucket=True)
    nd = mesh.shape["data"]
    Q0 = codes.shape[0]
    Qp = ((Q0 + nd - 1) // nd) * nd
    if Qp != Q0:
        codes = np.pad(
            codes, ((0, Qp - Q0), (0, 0)), constant_values=INVALID
        )
        lengths = np.pad(lengths, (0, Qp - Q0))
    Q, L = codes.shape
    q_per = Q // nd
    assert q_per <= max_tag(k)
    ref_mat = np.zeros((Q, L), dtype=np.uint8)
    for q, r in enumerate(ref_seqs):
        ref_mat[q, : len(r)] = np.frombuffer(bytes(r), dtype=np.uint8)

    shard = NamedSharding(mesh, P("data"))
    codes_d = jax.device_put(jnp.asarray(codes), shard)
    ref_d = jax.device_put(jnp.asarray(ref_mat), shard)
    len_d = jax.device_put(jnp.asarray(lengths), shard)

    def _pow2_cap(n, lo=256):
        c = lo
        while c < n:
            c <<= 1
        return c

    with stage("map_sweep", bases=sum(c.size for c in code_list)):
        ms_d, uniq_d, rows_d = _stage1_2d(
            sidx.keys3, sidx.down, sidx.up, jnp.int32(sidx.n_rows),
            codes_d, k=k, mesh=mesh,
        )
        cap_d = _pow2_cap(L // 1024)
        cap_g = _pow2_cap(L // 1536, lo=256)
        cap_r_floor = 0
        for _attempt in range(3):
            cap_ext = _pow2_cap(max(4 * cap_g, 32 * q_per), lo=256)
            cap_r = max(
                _pow2_cap(int(q_per * (L // 1024) + cap_g // 2 + 256)),
                cap_r_floor,
            )
            delta4, _needs_host = _stage2_2d(
                sidx.keys3, codes_d, ref_d, len_d, ms_d, uniq_d, rows_d,
                jnp.int32(threshold), prob_bound(opts.max_error_prob),
                kk=k, cd=cap_d, cg=cap_g, ce=cap_ext, cr=cap_r,
                dg=bool(opts.fill_gaps), dv=bool(opts.call_variants),
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
                return None  # degrade to a 1D path
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
