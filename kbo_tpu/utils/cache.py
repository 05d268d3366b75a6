"""Opt-in persistent XLA compile-cache setup, keyed per backend.

Why this exists: XLA:CPU persistent-cache entries are AOT executables
compiled for the *exact host CPU* -- loading one compiled on a different
machine can SIGSEGV/SIGILL the process (observed: a 2.2 GB cache shipped in
git crashed fresh clones inside ``compilation_cache.get_executable_and_time``).
TPU executables compiled through the remote relay are chip-specific but not
host-specific, so they are safe to reuse across hosts.

Policy:
- TPU runs share one long-lived cache dir (``.jax_cache``) -- relay compiles
  cost 20-500 s and reuse is the whole point.
- CPU runs get a separate machine-local dir (``.jax_cache_cpu``) that is
  never shipped (gitignored) and never mixed with the TPU cache.
- The library itself (``kbo_tpu/__init__.py``) NEVER enables the cache;
  only long-compile entry points (bench.py, __graft_entry__.py,
  bench_scaling.py) call :func:`enable_compile_cache`.
"""

import os

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def compile_cache_dir() -> str | None:
    """Backend-keyed cache directory, decided from the env without touching
    ``jax.devices()`` (which can hang when the TPU relay is wedged).

    CPU runs get NO persistent cache at all: XLA:CPU AOT blobs embed
    per-process tuning features (observed: ``+prefer-no-scatter`` written
    by one process kind, rejected by another on the SAME machine), so
    reuse is unsound even machine-locally. TPU executables are compiled
    server-side per chip generation and reuse safely.
    """
    on_cpu = os.environ.get("JAX_PLATFORMS", "").strip().startswith(
        "cpu"
    ) or not os.environ.get("PALLAS_AXON_POOL_IPS")
    if on_cpu:
        return None
    return os.path.join(_REPO_ROOT, ".jax_cache")


def enable_compile_cache() -> str | None:
    """Point JAX's persistent compile cache at the backend-keyed dir
    (no-op on CPU, where AOT reuse is unsound)."""
    import jax

    path = compile_cache_dir()
    if path is None:
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
