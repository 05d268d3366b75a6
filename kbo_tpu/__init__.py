"""kbo-tpu: a TPU-native k-bounded matching statistics engine.

A from-scratch reimplementation of the capabilities of `kbo`
(https://github.com/tmaklin/kbo, reference mounted at /root/reference)
designed for TPU hardware: matching statistics are computed as a sorted
k-mer join (pack colex window keys -> lax.sort -> neighbor propagation ->
XOR/clz common prefix; see kbo_tpu/kernels/ms.py) instead of the
reference's sequential rank-walk, so the hot path is sorts and elementwise
ops -- no gathers -- and throughput scales with the query batch.

Public API mirrors the reference's top level (reference: src/lib.rs:501-821):

- :func:`build`   -- build an SBWT index + LCS array from sequences.
- :func:`matches` -- translated alignment of a query against an index.
- :func:`find`    -- local alignment segments (run-length encodings).
- :func:`map_`    -- query painted onto reference coordinates (``kbo map``).
- :func:`call`    -- variant calling between query index and reference seq.

Option dataclasses (:class:`BuildOpts`, :class:`MatchOpts`, :class:`FindOpts`,
:class:`MapOpts`, :class:`CallOpts`) mirror the reference defaults
(reference: src/lib.rs:255-466).
"""

import os as _os

if _os.environ.get("KBO_TPU_X64", "1") != "0":
    # 64-bit mode: the sort-join engine packs uint32 word pairs into uint64
    # sort keys (half the radix passes; measured 9.8ms -> 5.3ms at 2.36M
    # rows on one v5e). All kernel dtypes are explicit, so the global
    # promotion change is inert elsewhere. KBO_TPU_X64=0 opts out.
    try:
        import jax as _jax

        _jax.config.update("jax_enable_x64", True)
    except ImportError:
        pass

# Persistent XLA compile cache is OPT-IN (KBO_TPU_COMPILE_CACHE=<dir>):
# importing the library must not point the global JAX cache at a directory
# of AOT executables that may have been compiled on a different machine
# (XLA:CPU AOT blobs are machine-specific and loading a foreign one can
# SIGSEGV/SIGILL). The long-compile entry points that benefit from caching
# (bench.py, __graft_entry__.py, bench_scaling.py) opt in themselves.
_cache_dir = _os.environ.get("KBO_TPU_COMPILE_CACHE", "")
if _cache_dir and _cache_dir != "0":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir", _os.path.abspath(_cache_dir)
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except ImportError:
        pass

try:
    import jax as _jax

    # Pallas/Mosaic kernels serialize MLIR source locations INCLUDING
    # the caller's stack frames into the custom-call payload, so the
    # same kernel lowered from two different scripts (or after a
    # different number of prior lowerings) hashes to a different
    # persistent-cache key -- every fresh process recompiled the big
    # kernels (~140s each at 2M). Dropping tracebacks from locations
    # makes the payload canonical and the cache key stable.
    _jax.config.update("jax_traceback_in_locations_limit", 0)
except ImportError:
    pass

if _os.environ.get("KBO_TPU_PLATFORM"):
    # Reliable platform override: this environment's sitecustomize registers
    # the remote axon TPU plugin and pins jax_platforms, so the JAX_PLATFORMS
    # env var alone does not stick. KBO_TPU_PLATFORM=cpu forces local CPU.
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["KBO_TPU_PLATFORM"])
    except ImportError:
        pass

from kbo_tpu.opts import BuildOpts, CallOpts, FindOpts, MapOpts, MatchOpts
from kbo_tpu.api import build, call, find, map_, matches
from kbo_tpu.refine.variant_calling import Variant
from kbo_tpu.ops.format import RLE

__all__ = [
    "BuildOpts",
    "CallOpts",
    "FindOpts",
    "MapOpts",
    "MatchOpts",
    "RLE",
    "Variant",
    "build",
    "call",
    "find",
    "map_",
    "matches",
]

__version__ = "0.1.0"
