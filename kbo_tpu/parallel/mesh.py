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


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_matches(
    keys2, dummy2, dummy_v, codes, lengths, k: int, threshold, mesh
):
    fn = jax.shard_map(
        lambda k2, d2, dv, co, le, th: matches_pipeline_core(
            k2, d2, dv, co, le, k, th
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data"), P()),
        out_specs=P("data"),
    )
    return fn(keys2, dummy2, dummy_v, codes, lengths, threshold)


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

    dev = device_index(index)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    chars, ms = _sharded_matches(
        jax.device_put(dev.keys2, repl),
        jax.device_put(dev.dummy2, repl),
        jax.device_put(dev.dummy_v, repl),
        jax.device_put(jnp.asarray(codes), shard),
        jax.device_put(jnp.asarray(lengths), shard),
        dev.k,
        jnp.int32(threshold),
        mesh,
    )
    chars = np.asarray(chars.astype(jnp.int32)).astype(np.uint8)
    return [chars[i, : c.size] for i, c in enumerate(code_list)]
