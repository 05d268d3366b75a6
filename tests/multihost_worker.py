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

    # map across hosts: per-ref-sequence independence makes map
    # embarrassingly parallel at the contig level -- each process maps
    # its own partition on local devices, and the deterministic merge is
    # one allgather of the per-process outputs (SURVEY §2.3 "collective
    # result merge"; no global-mesh sweep needed)
    from kbo_tpu import MapOpts, api

    bo = BuildOpts(k=31, build_select=True)
    qidx = build([genome], bo)
    refs = []
    for i in range(4):
        r = bytearray(genome[i * 4000 : i * 4000 + 3000])
        r[1500] = bases[(bases.tolist().index(r[1500]) + 1) % 4]
        refs.append(bytes(r))
    mine = refs[jax.process_index()::2]
    opts = MapOpts(fill_gaps=False, call_variants=False,
                   sbwt_build_opts=bo)
    local_out = api.map_batch(mine, qidx, opts)
    import numpy as np2

    from jax.experimental import multihost_utils

    local_digest = np2.frombuffer(
        hashlib.sha256(b"".join(local_out)).digest(), dtype=np2.uint8
    )
    all_digests = np2.asarray(
        multihost_utils.process_allgather(local_digest)
    )  # [2, 32] in process order: the deterministic merge
    map_digest = hashlib.sha256(all_digests.tobytes()).hexdigest()

    with open(out_path, "w") as f:
        f.write(digest + "\n" + map_digest)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
