"""ctypes bindings for the native single-core engine (csrc/kbo_cpu.cpp).

The library is built on demand with `make -C csrc`; all entry points degrade
gracefully to the Python implementations when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_SO = _HERE / "_native" / "libkbo_cpu.so"
_CSRC = _HERE.parent / "csrc"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")

    lib.kbo_ms_stream.argtypes = [
        u32p, i32p, i32p, u8p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        u8p, ctypes.c_int64, i32p, i64p, i64p,
    ]
    lib.kbo_ms_stream.restype = None
    lib.kbo_derandomize.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i64p,
    ]
    lib.kbo_derandomize.restype = None
    lib.kbo_translate.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, u8p,
    ]
    lib.kbo_translate.restype = None
    if not all(
        hasattr(lib, f)
        for f in ("kbo_build", "kbo_build_export", "kbo_fill_gaps",
                  "kbo_call_variants")
    ):  # stale .so predating the refine functions: rebuild or fall back
        return None
    lib.kbo_build.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32]
    lib.kbo_build.restype = ctypes.c_int64
    lib.kbo_build_export.argtypes = [u32p, i32p, i32p, u8p, i64p]
    lib.kbo_build_export.restype = None
    lib.kbo_fill_gaps.argtypes = [
        u8p, ctypes.c_int64, i64p, i64p, u8p, u8p, i64p,
        u32p, i32p, i32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double,
    ]
    lib.kbo_fill_gaps.restype = None
    lib.kbo_call_variants.argtypes = [
        i32p, i64p, i64p, u8p, ctypes.c_int64,
        u8p, i64p, u32p, i32p, i32p, u8p, ctypes.c_int64, ctypes.c_int64,
        u32p, i32p, i32p, u8p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        i64p, i32p, i32p, u8p, u8p, ctypes.c_int64,
    ]
    lib.kbo_call_variants.restype = ctypes.c_int64
    if hasattr(lib, "fastx_scan_fasta"):  # added after the round-1 .so
        for name in ("fastx_scan_fasta", "fastx_scan_fastq"):
            fn = getattr(lib, name)
            fn.argtypes = [
                u8p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            fn.restype = ctypes.c_int64
    if hasattr(lib, "kbo_pack_ascii"):  # added in round 5
        lib.kbo_pack_ascii.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i32p,
            u8p, i64p, u8p, ctypes.c_int64,
        ]
        lib.kbo_pack_ascii.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def lib():
    """The loaded ctypes library (None when the toolchain is unavailable)."""
    return _load()


def ms_stream(index, codes: np.ndarray):
    """Single-core streaming MS (the reference's algorithm, with LCS
    contraction). Returns (ms int64 [L], intervals int64 [L, 2])."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    L = codes.size
    ms = np.empty(L, dtype=np.int32)
    lo = np.empty(L, dtype=np.int64)
    hi = np.empty(L, dtype=np.int64)
    lib.kbo_ms_stream(
        np.ascontiguousarray(index.bits.reshape(-1)),
        np.ascontiguousarray(index.cum.reshape(-1)),
        np.ascontiguousarray(index.C),
        np.ascontiguousarray(index.lcs),
        index.n_rows,
        index.n_words,
        index.k,
        codes,
        L,
        ms,
        lo,
        hi,
    )
    return ms.astype(np.int64), np.stack([lo, hi], axis=1)


def derandomize(noisy_ms: np.ndarray, k: int, threshold: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    noisy = np.ascontiguousarray(noisy_ms, dtype=np.int32)
    out = np.empty(noisy.size, dtype=np.int64)
    lib.kbo_derandomize(noisy, noisy.size, k, threshold, out)
    return out


def translate(derand_ms: np.ndarray, k: int, threshold: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    d = np.ascontiguousarray(derand_ms, dtype=np.int64)
    out = np.zeros(d.size, dtype=np.uint8)  # zero-init: translate reads ahead
    lib.kbo_translate(d, d.size, k, threshold, out)
    return out


def build_arrays(codes: np.ndarray, k: int):
    """Single-core C++ SBWT construction (sorted 3-bit colex keys, k <= 63).

    Returns a dict of (bits, cum, C, lcs, row_pos, text, n_rows, n_words) --
    the rank-query arrays kbo_ms_stream consumes. Mirrors the reference's
    build-inside-call (src/lib.rs:553) for the native end-to-end baseline.
    """
    lib = _load()
    assert lib is not None
    from kbo_tpu.index.encode import split_segments

    parts = []
    for seg in split_segments(np.asarray(codes, dtype=np.uint8)):
        parts.append(np.zeros(k, dtype=np.uint8))
        parts.append(seg)
    assert parts, "cannot build an index from empty input"
    buf = np.ascontiguousarray(np.concatenate(parts))
    n_rows = int(lib.kbo_build(buf, buf.size, k))
    assert n_rows > 0, "native build failed (k > 63?)"
    n_words = n_rows // 32 + 1
    bits = np.zeros(4 * n_words, dtype=np.uint32)
    cum = np.zeros(4 * n_words, dtype=np.int32)
    C = np.zeros(4, dtype=np.int32)
    lcs = np.zeros(n_rows, dtype=np.uint8)
    row_pos = np.zeros(n_rows, dtype=np.int64)
    lib.kbo_build_export(bits, cum, C, lcs, row_pos)
    return {
        "bits": bits, "cum": cum, "C": C, "lcs": lcs, "row_pos": row_pos,
        "text": buf, "n_rows": n_rows, "n_words": n_words,
    }


def pack_ascii(ref_mat: np.ndarray, lengths):
    """Native twin of kernels.mapsweep.pack_ascii_host: identical output
    contract ((packed4 [Q, L//4], exc_pos int32 pow2-padded, exc_byte) or
    None when L % 4 != 0 / exceptions exceed the paying threshold), or
    None when the native library is unavailable (caller falls back to the
    numpy formulation)."""
    lib = _load()
    if lib is None or not hasattr(lib, "kbo_pack_ascii"):
        return None
    ref_mat = np.ascontiguousarray(ref_mat, dtype=np.uint8)
    Q, L = ref_mat.shape
    if L % 4:
        return None
    lens = np.ascontiguousarray(np.asarray(lengths)[:Q], dtype=np.int32)
    max_e = max(64, Q * L // 16)
    packed4 = np.empty((Q, L // 4), dtype=np.uint8)
    exc_pos = np.empty(max_e, dtype=np.int64)
    exc_byte = np.empty(max_e, dtype=np.uint8)
    n_exc = int(
        lib.kbo_pack_ascii(
            ref_mat.reshape(-1), Q, L, lens, packed4.reshape(-1),
            exc_pos, exc_byte, max_e,
        )
    )
    if n_exc < 0 or n_exc > max_e:
        return None
    cap_e = 64
    while cap_e < n_exc:
        cap_e <<= 1
    pos_pad = np.full(cap_e, Q * L, dtype=np.int32)
    byte_pad = np.zeros(cap_e, dtype=np.uint8)
    pos_pad[:n_exc] = exc_pos[:n_exc]
    byte_pad[:n_exc] = exc_byte[:n_exc]
    return packed4, pos_pad, byte_pad


def map_e2e(index, ref_seq: bytes, threshold: int, max_error_prob: float):
    """Single-core end-to-end `kbo map` (the bench denominator): streaming
    MS -> derandomize -> translate -> gap fill -> variant call (builds the
    inner reference index, reference: src/lib.rs:553) -> add_variants ->
    relative_to_ref. All sequential native code plus trivial numpy glue.
    Returns (output bytes, n_variants).
    """
    import math

    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.ops import translate as tr
    from kbo_tpu.ops.format import relative_to_ref
    from kbo_tpu.refine.variant_calling import Variant

    lib = _load()
    assert lib is not None
    k = index.k
    codes = np.ascontiguousarray(encode_ascii(bytes(ref_seq)))
    n = codes.size
    ms32 = np.empty(n, dtype=np.int32)
    lo = np.empty(n, dtype=np.int64)
    hi = np.empty(n, dtype=np.int64)
    bits = np.ascontiguousarray(index.bits.reshape(-1))
    cum = np.ascontiguousarray(index.cum.reshape(-1))
    C = np.ascontiguousarray(index.C)
    lcs = np.ascontiguousarray(index.lcs)
    lib.kbo_ms_stream(
        bits, cum, C, lcs, index.n_rows, index.n_words, k,
        codes, n, ms32, lo, hi,
    )
    derand = np.empty(n, dtype=np.int64)
    lib.kbo_derandomize(ms32, n, k, threshold, derand)
    chars = np.zeros(n, dtype=np.uint8)
    lib.kbo_translate(derand, n, k, threshold, chars)

    text = np.ascontiguousarray(index.text)
    row_pos = np.ascontiguousarray(index.row_pos)
    lib.kbo_fill_gaps(
        chars, n, lo, hi, codes, text, row_pos,
        bits, cum, C, index.n_rows, index.n_words, k, threshold,
        math.log1p(-max_error_prob),
    )

    inner = build_arrays(codes, k)
    cap = max(1024, n // 64)
    while True:
        pos = np.zeros(cap, dtype=np.int64)
        qlen = np.zeros(cap, dtype=np.int32)
        rlen = np.zeros(cap, dtype=np.int32)
        qch = np.zeros(cap * k, dtype=np.uint8)
        rch = np.zeros(cap * k, dtype=np.uint8)
        cnt = int(
            lib.kbo_call_variants(
                ms32, lo, hi, codes, n,
                text, row_pos, bits, cum, C, lcs,
                index.n_rows, index.n_words,
                inner["bits"], inner["cum"], inner["C"], inner["lcs"],
                inner["n_rows"], inner["n_words"], k, threshold,
                pos, qlen, rlen, qch, rch, cap,
            )
        )
        if cnt < cap:
            break
        # a full buffer is indistinguishable from exactly-cap variants:
        # retry with more room rather than silently truncating
        cap *= 4
    variants = [
        Variant(
            query_pos=int(pos[t]),
            query_chars=qch[t * k : t * k + qlen[t]].tobytes(),
            ref_chars=rch[t * k : t * k + rlen[t]].tobytes(),
        )
        for t in range(cnt)
    ]
    refined = [chr(c) for c in chars]
    refined = tr.add_variants(refined, variants)
    return relative_to_ref(ref_seq, refined), cnt
