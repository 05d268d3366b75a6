"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY §4 testing plan).

Note: this environment's sitecustomize pre-imports jax and registers the
remote axon TPU plugin with JAX_PLATFORMS=axon; without the override below
every tiny test op becomes a network round trip to the TPU tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# NO persistent compile cache for the CPU suite: XLA:CPU AOT blobs embed
# per-process tuning features (e.g. +prefer-no-scatter), so even blobs
# written on THIS machine mismatch across process kinds (observed with
# the gloo-backed distributed worker) and the loader warns about SIGILL.
# CPU compiles are cheap; the library never enables the cache either
# (VERDICT r2 weak #1).
os.environ["KBO_TPU_COMPILE_CACHE"] = "0"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:  # pragma: no cover
    pass

import pytest


@pytest.fixture()
def fetch_counter(monkeypatch):
    """Record every device->host materialization (np.asarray/np.array of a
    jax.Array): through the relay each fetch is a ~30ms round trip, so the
    COUNT is the perf contract the budget tests pin."""
    import jax
    import numpy as np

    fetches = []
    orig_asarray, orig_array = np.asarray, np.array

    def wrap(fn):
        def inner(obj, *a, **k):
            if isinstance(obj, jax.Array):
                fetches.append((tuple(obj.shape), str(obj.dtype)))
            return fn(obj, *a, **k)

        return inner

    monkeypatch.setattr(np, "asarray", wrap(orig_asarray))
    monkeypatch.setattr(np, "array", wrap(orig_array))
    return fetches


@pytest.fixture(autouse=True)
def _bound_xla_memory_maps():
    """Keep the process under the kernel's vm.max_map_count (65530 default).

    Every live XLA:CPU executable holds JIT-mapped code pages; a full-suite
    run accumulates ~65k maps around test ~200 and the next mmap failure
    crashes the *compiler* (observed as a SIGSEGV inside
    compilation_cache.put_executable_and_time and a SIGABRT inside
    backend_compile_and_load -- both at whatever test happened to compile
    next). jax.clear_caches() releases the executables (measured: 1125
    maps -> 522), so clear once the count nears the limit; the threshold
    leaves headroom for the heaviest single file's growth.
    """
    yield
    try:
        with open("/proc/self/maps") as fh:
            n_maps = sum(1 for _ in fh)
    except OSError:  # non-Linux: nothing to bound
        return
    if n_maps > 40_000:
        jax.clear_caches()
