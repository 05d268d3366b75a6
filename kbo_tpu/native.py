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
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


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
