"""FASTA/FASTQ IO: native C++ scanner vs the pure-Python oracle.

The reference parses via needletail (native, DEFLATE-capable; reference:
src/lib.rs:52-54); here csrc/fastx.cpp scans plain buffers and
kbo_tpu/io/fastx.py keeps a pure-Python parser as fallback + oracle.
"""

import gzip

import numpy as np
import pytest

from kbo_tpu import native
from kbo_tpu.io.fastx import read_fastx, read_fastx_py


def _write(tmp_path, name, data: bytes):
    p = tmp_path / name
    p.write_bytes(data)
    return p


FASTA = (
    b">chr1 first record\nACGTACGT\nGGTT\n\n>chr2\r\nTTTT\r\nAAAA\r\n"
    b">empty-seq\n>chr3\nacgtn\n"
)
FASTQ = (
    b"@read1 some desc\nACGTACGTAA\n+\nIIIIIIIIII\n"
    b"\n \t\n"  # blank separator lines (whitespace-only)
    b"@read2\r\nGGTTCC\r\n+read2\r\nIIIIII\r\n"
)


def test_fasta_native_matches_python(tmp_path):
    p = _write(tmp_path, "a.fasta", FASTA)
    got = read_fastx(p)
    want = read_fastx_py(p)
    assert got == want
    assert [n for n, _ in got] == ["chr1 first record", "chr2", "empty-seq", "chr3"]
    assert got[0][1] == b"ACGTACGTGGTT"
    assert got[1][1] == b"TTTTAAAA"
    assert got[2][1] == b""


def test_fastq_native_matches_python(tmp_path):
    p = _write(tmp_path, "a.fastq", FASTQ)
    got = read_fastx(p)
    want = read_fastx_py(p)
    assert got == want
    assert got == [("read1 some desc", b"ACGTACGTAA"), ("read2", b"GGTTCC")]


def test_gzip_fasta(tmp_path):
    p = _write(tmp_path, "a.fasta.gz", gzip.compress(FASTA))
    assert read_fastx(p) == read_fastx_py(p)


def test_random_fasta_differential(tmp_path):
    rng = np.random.default_rng(3)
    bases = "ACGTN"
    chunks = []
    for i in range(50):
        seq = "".join(
            rng.choice(list(bases), size=int(rng.integers(0, 200)))
        )
        width = int(rng.integers(1, 80))
        lines = [seq[j : j + width] for j in range(0, len(seq), width)] or [""]
        chunks.append(f">rec{i} d{i}\n" + "\n".join(lines) + "\n")
    p = _write(tmp_path, "r.fasta", "".join(chunks).encode())
    got = read_fastx(p)
    want = read_fastx_py(p)
    assert got == want
    assert len(got) == 50


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_scanner_is_used(tmp_path):
    assert hasattr(native.lib(), "fastx_scan_fasta")


def test_malformed_rejected(tmp_path):
    p = _write(tmp_path, "bad.txt", b"not a fasta\n")
    with pytest.raises(ValueError):
        read_fastx(p)

def test_leading_blank_lines_tolerated(tmp_path):
    # needletail (the reference's parser) skips leading blank lines
    p1 = _write(tmp_path, "lead.fasta", b"\n\r\n" + FASTA)
    assert read_fastx(p1) == read_fastx_py(p1)
    assert read_fastx(p1)[0][1] == b"ACGTACGTGGTT"
    p2 = _write(tmp_path, "lead.fastq", b"\n \n" + FASTQ)
    assert read_fastx(p2) == read_fastx_py(p2)
    assert read_fastx(p2)[0] == ("read1 some desc", b"ACGTACGTAA")
