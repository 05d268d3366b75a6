"""FASTA/FASTQ reading with transparent gzip support.

The reference reads inputs via needletail and supports DEFLATE compression
(reference: src/lib.rs:52-54); we mirror: plain or gzip FASTA/FASTQ, format
sniffed from the first byte.
"""

from __future__ import annotations

import gzip
import io
import pathlib


def _open(path):
    raw = open(path, "rb")
    magic = raw.read(2)
    raw.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=raw))
    return raw


def read_fastx(path) -> list[tuple[str, bytes]]:
    """Parse a FASTA or FASTQ file -> [(record name, sequence bytes)]."""
    path = pathlib.Path(path)
    records: list[tuple[str, bytes]] = []
    with _open(path) as fh:
        first = fh.peek(1)[:1] if hasattr(fh, "peek") else b""
        if not first:
            head = fh.read(1)
            fh.seek(0)
            first = head
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
