"""FASTA/FASTQ reading with transparent gzip support.

The reference reads inputs via needletail, a native parser, and supports
DEFLATE compression (reference: src/lib.rs:52-54); we mirror both: plain
or gzip FASTA/FASTQ sniffed from the first byte, scanned by the native
C++ parser (csrc/fastx.cpp via ctypes, one pass, sequence bytes compacted
in C) with this module's pure-Python parser as the fallback and the
differential test oracle (tests/test_io.py).
"""

from __future__ import annotations

import gzip
import io
import pathlib

import numpy as np


def _open(path):
    raw = open(path, "rb")
    magic = raw.read(2)
    raw.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=raw))
    return raw


def _read_raw(path) -> bytes:
    """Whole file, gunzipped if needed (the native scanner wants a flat
    buffer; bacterial-scale inputs are tens of MB)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return data


def _read_fastx_native(path) -> list[tuple[str, bytes]] | None:
    from kbo_tpu import native

    if not native.available():
        return None
    lib = native.lib()
    scan = getattr(
        lib, "fastx_scan_fasta", None
    )  # older .so without the scanner
    if scan is None:
        return None
    data = _read_raw(path)
    first = _sniff(data.lstrip(), path)
    buf = np.frombuffer(data, dtype=np.uint8)
    fn = lib.fastx_scan_fasta if first == b">" else lib.fastx_scan_fastq
    if first == b"@":
        # the FASTA scanner tolerates leading blank lines; the FASTQ one
        # treats them as separators, so both accept the stripped view
        buf = np.frombuffer(data.lstrip(), dtype=np.uint8)
        data = data.lstrip()
    import ctypes

    n = int(fn(buf, np.int64(buf.size), None, None, np.int64(0)))
    if n < 0:
        raise ValueError(f"malformed FASTA/FASTQ record in {path}")
    out = np.empty(buf.size, dtype=np.uint8)
    recs = np.empty(4 * max(n, 1), dtype=np.int64)
    n2 = int(
        fn(
            buf,
            np.int64(buf.size),
            out.ctypes.data_as(ctypes.c_void_p),
            recs.ctypes.data_as(ctypes.c_void_p),
            np.int64(n),
        )
    )
    assert n2 == n
    recs = recs[: 4 * n].reshape(n, 4)
    return [
        (
            data[r[0] : r[0] + r[1]].decode(errors="replace"),
            out[r[2] : r[2] + r[3]].tobytes(),
        )
        for r in recs
    ]


def _sniff(data: bytes, path) -> bytes:
    """First significant byte decides the format (leading blank lines are
    tolerated, as the reference's needletail parser does)."""
    first = data[:1]
    if first not in (b">", b"@"):
        raise ValueError(f"{path}: not a FASTA/FASTQ file")
    return first


def read_fastx(path) -> list[tuple[str, bytes]]:
    """Parse a FASTA or FASTQ file -> [(record name, sequence bytes)]."""
    path = pathlib.Path(path)
    native_records = _read_fastx_native(path)
    if native_records is not None:
        return native_records
    return read_fastx_py(path)


def read_fastx_py(path) -> list[tuple[str, bytes]]:
    """Pure-Python parser: the native scanner's fallback and test oracle."""
    path = pathlib.Path(path)
    records: list[tuple[str, bytes]] = []
    with _open(path) as fh:
        head = fh.read()
        first = _sniff(head.lstrip(), path)
        fh = io.BytesIO(head.lstrip() if first == b"@" else head)
        if first == b">":
            name = None
            chunks: list[bytes] = []
            for line in fh:
                line = line.rstrip()
                if line.startswith(b">"):
                    if name is not None:
                        records.append((name, b"".join(chunks)))
                    name = line[1:].decode(errors="replace")
                    chunks = []
                elif line:
                    chunks.append(line)
            if name is not None:
                records.append((name, b"".join(chunks)))
        elif first == b"@":
            while True:
                header = fh.readline()
                while header and not header.strip():
                    header = fh.readline()  # skip blank separator lines
                if not header:
                    break
                seq = fh.readline().rstrip()
                plus = fh.readline()
                qual = fh.readline()
                if not header.startswith(b"@") or not plus.startswith(b"+"):
                    raise ValueError(f"malformed FASTQ record in {path}")
                records.append((header[1:].rstrip().decode(errors="replace"), bytes(seq)))
                if not qual:
                    break
        else:
            raise ValueError(f"{path}: not a FASTA/FASTQ file")
    return records
