"""MS backend dispatch: device (JAX) for real workloads, host oracle for
tiny inputs and as a correctness fallback.

Set ``KBO_TPU_BACKEND=host`` or ``device`` to force a backend.
"""

from __future__ import annotations

import os

import numpy as np

from kbo_tpu.index.sbwt import SbwtIndex

# inputs below this size use the scalar host oracle (cheaper than a device
# round trip); the device path pads to one of a few block sizes to bound the
# number of compiled kernel variants per k.
_HOST_CUTOFF = 256
_BLOCKS = (1024, 4096, 16384, 65536)

_device_cache: dict[int, object] = {}


def _backend() -> str:
    return os.environ.get("KBO_TPU_BACKEND", "auto")


def device_index(index: SbwtIndex):
    """Memoized device-resident rank tables for an index."""
    from kbo_tpu.kernels.ms import DeviceIndex

    key = id(index)
    cached = _device_cache.get(key)
    if cached is None or cached[0] is not index:
        _device_cache.clear()  # hold at most a couple of live indexes
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

    for b in _BLOCKS:
        if codes.size <= b:
            block = b
            break
    else:
        block = _BLOCKS[-1]
    return query_ms_device(device_index(index), codes, block=block)


def compute_ms_many(index: SbwtIndex, code_list: list[np.ndarray]):
    """Batched MS for many short queries (e.g. per-candidate k-mers).

    Each query is independent; all positions go through the kernel as one
    batch. Returns a list of (ms, intervals) per query.
    """
    if not code_list:
        return []
    backend = _backend()
    total = sum(c.size for c in code_list)
    if backend == "host" or (backend == "auto" and total < _HOST_CUTOFF):
        from kbo_tpu.ops.ms import query_ms_codes

        return [query_ms_codes(index, c) for c in code_list]

    from kbo_tpu.kernels.ms import ms_kernel, windows_from_codes

    dev = device_index(index)
    k = index.k
    wins, lmaxs, offsets = [], [], [0]
    for c in code_list:
        w, lm = windows_from_codes(np.asarray(c), k)
        wins.append(w)
        lmaxs.append(lm)
        offsets.append(offsets[-1] + c.size)
    win = np.concatenate(wins, axis=0)
    lmax = np.concatenate(lmaxs)
    P = win.shape[0]
    for b in _BLOCKS:
        if P <= b:
            break
    pad = b - P if P <= b else 0
    if pad:
        win = np.pad(win, ((0, pad), (0, 0)))
        lmax = np.pad(lmax, (0, pad))
    out = []
    if P > b:  # very large batch: chunk
        ms = np.empty(P, dtype=np.int64)
        iv = np.empty((P, 2), dtype=np.int64)
        B = _BLOCKS[-1]
        for s in range(0, P, B):
            e = min(P, s + B)
            wb = win[s:e]
            lb = lmax[s:e]
            if e - s < B:
                wb = np.pad(wb, ((0, B - (e - s)), (0, 0)))
                lb = np.pad(lb, (0, B - (e - s)))
            m, l, r = ms_kernel(dev.table2, dev.C, dev.n_rows, wb, lb, k)
            ms[s:e] = np.asarray(m[: e - s], dtype=np.int64)
            iv[s:e, 0] = np.asarray(l[: e - s], dtype=np.int64)
            iv[s:e, 1] = np.asarray(r[: e - s], dtype=np.int64)
    else:
        m, l, r = ms_kernel(dev.table2, dev.C, dev.n_rows, win, lmax, k)
        ms = np.asarray(m[:P], dtype=np.int64)
        iv = np.stack(
            [np.asarray(l[:P], dtype=np.int64), np.asarray(r[:P], dtype=np.int64)],
            axis=1,
        )
    for i, c in enumerate(code_list):
        s, e = offsets[i], offsets[i + 1]
        out.append((ms[s:e], iv[s:e]))
    return out
