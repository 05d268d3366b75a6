"""MS backend dispatch: device (JAX) for real workloads, host oracle for
tiny inputs and as a correctness fallback.

Set ``KBO_TPU_BACKEND=host`` or ``device`` to force a backend.
"""

from __future__ import annotations

import os

import numpy as np

from kbo_tpu.index.sbwt import SbwtIndex

# inputs below this size use the scalar host oracle (cheaper than a device
# round trip)
_HOST_CUTOFF = 256

_device_cache: dict[int, object] = {}


def _backend() -> str:
    return os.environ.get("KBO_TPU_BACKEND", "auto")


def device_index(index: SbwtIndex):
    """Memoized device-resident rank tables for an index."""
    from kbo_tpu.kernels.ms import DeviceIndex

    key = id(index)
    cached = _device_cache.get(key)
    if cached is None or cached[0] is not index:
        if len(_device_cache) > 4:
            _device_cache.clear()
        cached = (index, DeviceIndex(index))
        _device_cache[key] = cached
    return cached[1]


def compute_ms(index: SbwtIndex, codes: np.ndarray):
    """(ms, intervals) for an encoded query via the best available backend."""
    codes = np.asarray(codes)
    backend = _backend()
    if backend == "host" or (backend == "auto" and codes.size < _HOST_CUTOFF):
        from kbo_tpu.ops.ms import query_ms_codes

        return query_ms_codes(index, codes)

    from kbo_tpu.kernels.ms import query_ms_device

    return query_ms_device(device_index(index), codes)


def compute_ms_many(index: SbwtIndex, code_list: list[np.ndarray]):
    """Batched MS for many short queries (e.g. per-candidate k-mers).

    Each query is independent; all positions go through the kernel as one
    packed batch. Returns a list of (ms, intervals) per query.
    """
    if not code_list:
        return []
    backend = _backend()
    total = sum(c.size for c in code_list)
    if backend == "host" or (backend == "auto" and total < _HOST_CUTOFF):
        from kbo_tpu.ops.ms import query_ms_codes

        return [query_ms_codes(index, c) for c in code_list]

    from kbo_tpu.kernels.ms import ms_packed, pack_queries

    dev = device_index(index)
    buf, pos, lmax, offsets = pack_queries(
        [np.asarray(c) for c in code_list], dev.k
    )
    ms, iv = ms_packed(dev, buf, pos, lmax)
    return [
        (ms[offsets[i] : offsets[i + 1]], iv[offsets[i] : offsets[i + 1]])
        for i in range(len(code_list))
    ]
