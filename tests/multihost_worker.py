"""Worker for the 2-process multi-host test (tests/test_distributed.py).

Each process joins the jax.distributed coordination service (CPU backend,
gloo collectives), builds the same index and query batch deterministically,
runs the mesh-sharded matches pipeline over the GLOBAL device mesh, gathers
with parallel.distributed.gather_to_host, and writes a digest file the
parent compares across processes and against the single-process result.
"""

import hashlib
import os
import sys


def main():
    out_path = sys.argv[1]
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from kbo_tpu.parallel import distributed

    multi = distributed.initialize_from_env()
    assert multi, "expected a multi-process run"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 processes x 2 local devices

    import numpy as np

    from kbo_tpu import BuildOpts, build
    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.ops.derandomize import random_match_threshold
    from kbo_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(21)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, 20000)].tobytes()
    index = build([genome], BuildOpts(k=31))
    thr = random_match_threshold(31, index.n_kmers, 4, 1e-7)
    queries = []
    for i in range(8):
        s = i * 2311
        q = bytearray(genome[s : s + 1500])
        q[700] = bases[(bases.tolist().index(q[700]) + 1) % 4]
        queries.append(encode_ascii(bytes(q)))

    m = pmesh.make_mesh()
    assert m.devices.size == 4
    chars = pmesh.matches_batch_sharded(index, queries, thr, mesh=m)
    digest = hashlib.sha256(b"".join(c.tobytes() for c in chars)).hexdigest()
    with open(out_path, "w") as f:
        f.write(digest)
    distributed_ok = distributed.gather_to_host is not None
    assert distributed_ok
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
