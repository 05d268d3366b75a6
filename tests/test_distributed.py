"""Multi-host runtime: a REAL 2-process jax.distributed run (CPU backend).

Launches two local processes that join a coordination service, shard one
query batch over the 4-device global mesh (2 processes x 2 local devices),
and gather results with parallel.distributed.gather_to_host; their outputs
must agree with each other and with a single-process run bit-exactly.
Exercises the multi-process branches of parallel/distributed.py and the
multi-host placement path (parallel.mesh.put_global).
"""

import hashlib
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_digest() -> str:
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
    chars = pmesh.matches_batch_sharded(index, queries, thr, mesh=pmesh.make_mesh())
    matches_digest = hashlib.sha256(
        b"".join(c.tobytes() for c in chars)
    ).hexdigest()

    # map: same contig-level partition the 2-process workers use
    from kbo_tpu import MapOpts, api

    bo = BuildOpts(k=31, build_select=True)
    qidx = build([genome], bo)
    refs = []
    for i in range(4):
        r = bytearray(genome[i * 4000 : i * 4000 + 3000])
        r[1500] = bases[(bases.tolist().index(r[1500]) + 1) % 4]
        refs.append(bytes(r))
    opts = MapOpts(fill_gaps=False, call_variants=False, sbwt_build_opts=bo)
    parts = []
    for pid in range(2):
        out = api.map_batch(refs[pid::2], qidx, opts)
        parts.append(
            np.frombuffer(
                hashlib.sha256(b"".join(out)).digest(), dtype=np.uint8
            )
        )
    map_digest = hashlib.sha256(np.stack(parts).tobytes()).hexdigest()
    return matches_digest + "\n" + map_digest


@pytest.mark.slow
def test_two_process_gather_matches_single(tmp_path):
    port = _free_port()
    root = pathlib.Path(__file__).resolve().parent.parent
    worker = root / "tests" / "multihost_worker.py"
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"digest_{pid}.txt"
        outs.append(out)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("JAX_PLATFORMS", None)
        # never share the persistent compile cache across process kinds:
        # the gloo-backed worker compiles for a different CPU feature set
        # than the plain pytest process, and foreign AOT blobs are the
        # fresh-clone crash class this repo just eliminated
        env.pop("KBO_TPU_COMPILE_CACHE", None)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = f"{root}:" + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        stdout, stderr = p.communicate(timeout=420)
        assert p.returncode == 0, (
            f"worker failed:\n{stdout.decode()[-2000:]}\n{stderr.decode()[-2000:]}"
        )
    digests = [o.read_text().strip() for o in outs]
    assert digests[0] == digests[1]
    assert digests[0] == _single_process_digest()
