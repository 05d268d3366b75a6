"""Multi-host runtime glue.

The reference is a single-threaded library; scaling across hosts is this
framework's addition (SURVEY §2.3). The communication backend is XLA
collectives over ICI/DCN — there is no NCCL/MPI anywhere: processes join a
jax.distributed coordination service, shard query batches over the global
``data`` mesh axis (kbo_tpu.parallel.mesh), and results return as globally
sharded arrays that :func:`gather_to_host` materializes per process.

Typical multi-host entry:

    from kbo_tpu.parallel import distributed, mesh
    distributed.initialize_from_env()          # no-op single-process
    m = mesh.make_mesh()                       # all global devices
    out = mesh.matches_batch_sharded(index, queries, threshold, mesh=m)
"""

from __future__ import annotations

import os


def initialize_from_env() -> bool:
    """Join the jax.distributed coordination service when configured.

    Reads the explicit env contract: JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID. Without JAX_COORDINATOR_ADDRESS
    this is a single-process no-op -- there is deliberately NO silent
    cloud-metadata auto-detection here (an argless
    ``jax.distributed.initialize()`` blocks waiting for a coordinator
    when launched outside a managed pod; multi-host runs must opt in via
    the env vars). Returns True when running multi-process. Safe to call
    twice.
    """
    import jax

    # NOTE: must not touch the backend (jax.devices / process_count) before
    # jax.distributed.initialize -- backend init pins single-process mode
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )
    return jax.process_count() > 1


def gather_to_host(global_array):
    """Materialize a (possibly multi-host) sharded array on every process.

    Single-process arrays convert directly; multi-host arrays go through an
    all-gather over DCN (jax.experimental.multihost_utils) so each process
    sees the full result — the deterministic merge step for find/call/map
    outputs (fixed-shape buffers, input order preserved).
    """
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(global_array)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(global_array, tiled=True)
    )
