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
