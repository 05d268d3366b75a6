"""MS backend dispatch: device (JAX sort-join) for real workloads, host
oracle for tiny inputs and as a correctness fallback.

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


def device_index(index):
    """Memoized device-resident sort-join key tables for an index.

    A :class:`kbo_tpu.kernels.ms.DeviceFullIndex` already IS its own
    device-resident table set and passes through."""
    from kbo_tpu.kernels.ms import DeviceFullIndex, DeviceIndex

    if isinstance(index, DeviceFullIndex):
        return index
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
    if isinstance(index, SbwtIndex) and (
        backend == "host"
        or (backend == "auto" and codes.size < _HOST_CUTOFF)
    ):
        from kbo_tpu.ops.ms import query_ms_codes

        return query_ms_codes(index, codes)

    from kbo_tpu.kernels.ms import query_ms_device

    return query_ms_device(device_index(index), codes)


def compute_ms_values(index: SbwtIndex, codes: np.ndarray):
    """MS values only (no intervals) -- the fast 2-bit join path."""
    codes = np.asarray(codes)
    backend = _backend()
    if isinstance(index, SbwtIndex) and (
        backend == "host"
        or (backend == "auto" and codes.size < _HOST_CUTOFF)
    ):
        from kbo_tpu.ops.ms import query_ms_codes

        return query_ms_codes(index, codes)[0]

    from kbo_tpu.kernels.ms import query_ms_values_device

    return query_ms_values_device(device_index(index), codes)


def compute_ms_values_many(index: SbwtIndex, code_list: list[np.ndarray]):
    """Batched MS values for many short queries (e.g. per-candidate k-mers).

    All queries go through the device join as one padded batch. Returns a
    list of int64 ms arrays, one per query.
    """
    out = compute_ms_values_many_async(index, code_list)
    return out() if callable(out) else out


def compute_ms_values_many_device(index: SbwtIndex, code_list):
    """Device-array form of :func:`compute_ms_values_many`: dispatches the
    batch and returns the [Q, Lb] int32 device array (not fetched), or None
    when the host path applies. Lets callers pack several independent
    batches into a single fetch (each fetch pays a relay round trip)."""
    if not code_list:
        return None
    backend = _backend()
    total = sum(c.size for c in code_list)
    if isinstance(index, SbwtIndex) and (
        backend == "host" or (backend == "auto" and total < _HOST_CUTOFF)
    ):
        return None

    import jax.numpy as jnp

    from kbo_tpu.kernels.ms import _ms2_jit
    from kbo_tpu.pipeline import _make_buf, _flat_ms_to_batch, pad_batch

    dev = device_index(index)
    codes, _ = pad_batch([np.asarray(c) for c in code_list], bucket=True)
    Q, L = codes.shape
    buf = _make_buf(jnp.asarray(codes), dev.k)
    return _flat_ms_to_batch(
        _ms2_jit(dev.keys2, dev.cap2, buf, dev.k), Q, L, dev.k
    )


def compute_ms_values_many_async(index: SbwtIndex, code_list):
    """Async :func:`compute_ms_values_many`: dispatches the device batch and
    returns a zero-arg finalizer, so two independent batches can overlap
    (each device fetch through the relay pays a full round trip). Host-path
    inputs return the result list directly."""
    if not code_list:
        return []
    ms = compute_ms_values_many_device(index, code_list)
    if ms is None:
        from kbo_tpu.ops.ms import query_ms_codes

        return [query_ms_codes(index, c)[0] for c in code_list]

    def finalize():
        ms_np = np.asarray(ms, dtype=np.int64)
        return [ms_np[i, : c.size] for i, c in enumerate(code_list)]

    return finalize


def compute_ms_intervals_at(
    index: SbwtIndex,
    codes: np.ndarray,
    positions: np.ndarray,
    ms: np.ndarray | None = None,
    dev_codes=None,
):
    """MS values + colex intervals at a sparse set of query positions.

    The refinement layers (gap filling, variant calling) only read intervals
    at data-dependent candidate positions; this avoids materializing the
    full-length interval pass (SURVEY §7.3 two-phase sparse refinement).
    ``ms`` is the full-length MS value vector from the main sweep; when
    given, the device pass only counts interval ranks (floor/ceil probes
    against the 3-bit all-rows keys) and never recomputes MS.
    Returns (ms int64 [P], intervals int64 [P, 2]) in `positions` order.
    """
    import jax

    codes = np.asarray(codes)
    positions = np.asarray(positions, dtype=np.int64)
    dev_ms = isinstance(ms, jax.Array)
    backend = _backend()
    if isinstance(index, SbwtIndex) and not dev_ms and (
        backend == "host"
        or (backend == "auto" and positions.size * index.k < _HOST_CUTOFF)
    ):
        from kbo_tpu.ops.ms import query_ms_codes

        ms_full, iv = query_ms_codes(index, codes)
        return ms_full[positions], iv[positions]

    import jax.numpy as jnp

    from kbo_tpu.kernels.ms import (
        INVALID,
        _intervals3_pos_jit,
        _intervals3_windows_jit,
        _intervals3_windows_msrow_jit,
    )

    dev = device_index(index)
    k = dev.k
    if ms is None:
        from kbo_tpu.kernels.ms import query_ms_values_device

        ms = query_ms_values_device(dev, codes)
    P = positions.size
    Pb = 64
    while Pb < P:
        Pb <<= 1
    if dev_ms and dev_codes is not None:
        # fully device-side probe: windows gathered from the resident code
        # row, ms from the resident ms row; host traffic = positions up,
        # one stacked int32 [3, Pb] down
        pos32 = np.zeros(Pb, dtype=np.int32)
        pos32[:P] = positions
        out = np.asarray(
            _intervals3_pos_jit(
                dev.keys3, dev_codes, ms, jnp.asarray(pos32), k
            ),
            dtype=np.int64,
        )
        iv = np.stack([out[0, :P], out[1, :P]], axis=1)
        return out[2, :P], iv
    # window matrix on host (host-side gathers are cheap)
    padded = np.full(codes.size + k - 1, INVALID, dtype=np.uint8)
    padded[k - 1 :] = codes
    offs = positions[:, None] + np.arange(k, dtype=np.int64)[None, :]
    windows = padded[offs]  # [P, k]; row p = codes[pos-k+1 ..= pos]
    if Pb != P:
        windows = np.concatenate(
            [windows, np.full((Pb - P, k), INVALID, dtype=np.uint8)]
        )
    if dev_ms:
        # MS row stays on device: gather the values inside the probe and
        # fetch (l, r, ms_at) as one stacked array -- one round trip
        pos32 = np.zeros(Pb, dtype=np.int32)
        pos32[:P] = positions
        out = _intervals3_windows_msrow_jit(
            dev.keys3, jnp.asarray(windows), ms, jnp.asarray(pos32), k
        )
        out = np.asarray(out, dtype=np.int64)
        iv = np.stack([out[0, :P], out[1, :P]], axis=1)
        return out[2, :P], iv
    ms_at = np.asarray(ms, dtype=np.int64)[positions]
    ms_dev = np.zeros(Pb, dtype=np.int32)
    ms_dev[:P] = ms_at
    l, r = _intervals3_windows_jit(
        dev.keys3, jnp.asarray(windows), jnp.asarray(ms_dev), k
    )
    iv = np.stack(
        [np.asarray(l[:P], dtype=np.int64), np.asarray(r[:P], dtype=np.int64)],
        axis=1,
    )
    return ms_at, iv


class SparseIntervals:
    """Lazy, batched colex-interval provider indexed like an [n, 2] array.

    Supports ``iv[pos, 0]`` / ``iv[pos, 1]`` and ``len(iv)`` so the
    refinement code is agnostic between a fully materialized interval array
    and this provider. Ranges must be prefetched (one device batch per
    prefetch call); reading an unfetched position raises.
    """

    def __init__(self, index: SbwtIndex, codes: np.ndarray, ms=None,
                 dev_codes=None):
        self._index = index
        self._codes = np.asarray(codes)
        # ms may be a host array OR a device-resident jax row (int32 [L],
        # query coordinates) that is never downloaded in full; dev_codes a
        # device-resident code row enabling on-device window assembly
        self._ms = ms
        self._dev_codes = dev_codes
        # sorted-array cache (dict-of-int caching cost ~seconds at 10^5
        # refinement probes): _pos sorted positions, _val [n, 3] = (l, r, ms).
        # Miss batches accumulate as extra sorted blocks and merge into the
        # main arrays only when the block list grows -- np.insert per
        # prefetch was an O(cache) copy each round, quadratic over the
        # anchor search's up-to-k/8 rounds per contig (VERDICT r2 weak #7)
        self._pos = np.zeros(0, dtype=np.int64)
        self._val = np.zeros((0, 3), dtype=np.int64)
        self._blocks: list[tuple[np.ndarray, np.ndarray]] = []
        # host-oracle results are computed full-length whatever the probe
        # count; cache the one pass so repeated prefetch misses (gap
        # filler + anchor rounds) never re-run it
        self._full = None

    def __len__(self) -> int:
        return self._codes.size

    def _have(self, positions) -> np.ndarray:
        """Boolean mask of positions already cached (main array or blocks)."""
        have = np.zeros(positions.size, dtype=bool)
        for pos_arr in [self._pos] + [p for p, _ in self._blocks]:
            if not pos_arr.size:
                continue
            loc = np.minimum(
                np.searchsorted(pos_arr, positions), pos_arr.size - 1
            )
            have |= pos_arr[loc] == positions
        return have

    def _consolidate(self) -> None:
        if not self._blocks:
            return
        parts_p = [self._pos] + [p for p, _ in self._blocks]
        parts_v = [self._val] + [v for _, v in self._blocks]
        pos = np.concatenate(parts_p)
        val = np.concatenate(parts_v, axis=0)
        order = np.argsort(pos, kind="stable")
        self._pos = pos[order]
        self._val = val[order]
        self._blocks = []

    def prefetch(self, positions) -> None:
        positions = np.unique(np.atleast_1d(
            np.asarray(positions, dtype=np.int64)
        ))
        if positions.size:
            positions = positions[~self._have(positions)]
        if positions.size == 0:
            return
        import jax as _jax

        host_branch = (
            isinstance(self._index, SbwtIndex)
            and not isinstance(self._ms, _jax.Array)
            and (
                _backend() == "host"
                or (
                    _backend() == "auto"
                    and positions.size * self._index.k < _HOST_CUTOFF
                )
            )
        )
        if host_branch:
            if self._full is None:
                from kbo_tpu.ops.ms import query_ms_codes

                self._full = query_ms_codes(self._index, self._codes)
            ms_at = self._full[0][positions]
            iv = self._full[1][positions]
        else:
            ms_at, iv = compute_ms_intervals_at(
                self._index, self._codes, positions, ms=self._ms,
                dev_codes=self._dev_codes,
            )
        new_val = np.concatenate(
            [iv, np.asarray(ms_at, dtype=np.int64)[:, None]], axis=1
        )
        if self._pos.size:
            self._blocks.append((positions, new_val))
            if len(self._blocks) > 8:
                self._consolidate()
        else:
            self._pos = positions
            self._val = new_val

    def _gather(self, positions) -> np.ndarray:
        """[P, 3] cached (l, r, ms) rows across the main array + blocks."""
        out = np.empty((positions.size, 3), dtype=np.int64)
        found = np.zeros(positions.size, dtype=bool)
        for pos_arr, val_arr in [(self._pos, self._val)] + self._blocks:
            if not pos_arr.size:
                continue
            loc = np.minimum(
                np.searchsorted(pos_arr, positions), pos_arr.size - 1
            )
            hit = (pos_arr[loc] == positions) & ~found
            if hit.any():
                out[hit] = val_arr[loc[hit]]
                found |= hit
        if positions.size and not found.all():
            raise KeyError("interval positions were not prefetched")
        return out

    def __getitem__(self, key):
        pos, col = key
        row = self._gather(np.asarray([pos], dtype=np.int64))
        return int(row[0, int(col)])

    def get_batch(self, positions) -> np.ndarray:
        """[P, 2] interval array for `positions` (prefetching the misses)."""
        positions = np.atleast_1d(np.asarray(positions, dtype=np.int64))
        self.prefetch(positions)
        return self._gather(positions)[:, :2]

    def get_ms_batch(self, positions) -> np.ndarray:
        """MS values at `positions` (prefetching the misses) -- lets the
        refinement layers read sparse MS without a full-vector download."""
        positions = np.atleast_1d(np.asarray(positions, dtype=np.int64))
        self.prefetch(positions)
        return self._gather(positions)[:, 2]


def compute_ms_values_vs_seq(
    ref_codes: np.ndarray, code_list: list[np.ndarray], k: int
):
    """Batched MS values of short queries against a RAW sequence (no index).

    Device path for the reference's build-an-index-inside-call() pattern
    (reference: src/lib.rs:553): joins query k-mer windows directly against
    the sequence's own window keys -- no host index construction. Falls
    back to a host build + oracle for tiny inputs.
    """
    out = compute_ms_values_vs_seq_async(ref_codes, code_list, k)
    return out() if callable(out) else out


def compute_ms_values_vs_seq_device(
    ref_codes: np.ndarray, code_list: list[np.ndarray], k: int
):
    """Device-array form of :func:`compute_ms_values_vs_seq` (see
    :func:`compute_ms_values_many_device` for the contract)."""
    if not code_list:
        return None
    ref_codes = np.asarray(ref_codes)
    backend = _backend()
    if backend == "host" or (
        backend == "auto" and ref_codes.size < 4 * _HOST_CUTOFF
    ):
        return None

    import jax.numpy as jnp

    from kbo_tpu.kernels.ms import INVALID, _ms3_batch_vs_seq_jit
    from kbo_tpu.pipeline import pad_batch

    buf = np.full(ref_codes.size + k - 1, INVALID, dtype=np.uint8)
    buf[k - 1 :] = ref_codes
    codes, _ = pad_batch([np.asarray(c) for c in code_list], bucket=True)
    return _ms3_batch_vs_seq_jit(jnp.asarray(buf), jnp.asarray(codes), k)


def compute_ms_values_vs_seq_async(
    ref_codes: np.ndarray, code_list: list[np.ndarray], k: int
):
    """Async :func:`compute_ms_values_vs_seq` (see
    :func:`compute_ms_values_many_async` for the contract)."""
    if not code_list:
        return []
    ms = compute_ms_values_vs_seq_device(ref_codes, code_list, k)
    if ms is None:
        from kbo_tpu.index.build import build_index_from_segments
        from kbo_tpu.index.encode import split_segments
        from kbo_tpu.ops.ms import query_ms_codes

        index = build_index_from_segments(
            split_segments(np.asarray(ref_codes)), k
        )
        return [query_ms_codes(index, c)[0] for c in code_list]

    def finalize():
        ms_np = np.asarray(ms, dtype=np.int64)
        return [ms_np[i, : c.size] for i, c in enumerate(code_list)]

    return finalize
