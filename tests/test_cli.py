"""CLI end-to-end tests: call/find/map/build on small FASTA fixtures."""

import gzip
import io

import numpy as np
import pytest

from kbo_tpu.cli import main
from kbo_tpu.io.fastx import read_fastx

BASES = b"ACGT"


@pytest.fixture
def genome_pair(tmp_path):
    rng = np.random.default_rng(11)
    ref = bytes(BASES[i] for i in rng.integers(0, 4, 3000))
    q = bytearray(ref)
    planted = []
    for p in range(400, 2600, 700):
        old = q[p]
        q[p] = BASES[(BASES.index(bytes([old])) + 1) % 4]
        planted.append(p)
    ref_path = tmp_path / "ref.fasta"
    q_path = tmp_path / "query.fasta"
    ref_path.write_text(">chr1 test reference\n" + ref.decode() + "\n")
    q_path.write_text(">q1 test query\n" + bytes(q).decode() + "\n")
    return ref_path, q_path, planted


def _run(argv, capsys):
    main(argv)
    return capsys.readouterr().out


def test_fastx_roundtrip(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">a desc\nACGT\nACGT\n>b\nTTTT\n")
    recs = read_fastx(fa)
    assert recs == [("a desc", b"ACGTACGT"), ("b", b"TTTT")]

    fq = tmp_path / "x.fastq.gz"
    with gzip.open(fq, "wb") as fh:
        fh.write(b"@r1\nACGTA\n+\nIIIII\n@r2\nGGG\n+\nIII\n")
    assert read_fastx(fq) == [("r1", b"ACGTA"), ("r2", b"GGG")]


def test_cli_call_vcf(genome_pair, capsys):
    ref_path, q_path, planted = genome_pair
    out = _run(
        ["call", "-r", str(ref_path), str(q_path), "-k", "51"], capsys
    )
    lines = out.strip().splitlines()
    assert lines[0] == "##fileformat=VCFv4.4"
    assert any(l.startswith("##contig=<ID=chr1,length=3000>") for l in lines)
    assert any(l.startswith("#CHROM\tPOS") for l in lines)
    records = [l for l in lines if not l.startswith("#")]
    positions = [int(l.split("\t")[1]) for l in records]
    assert positions == [p + 1 for p in planted]
    for l in records:
        f = l.split("\t")
        assert f[0] == "chr1" and f[6] == "." and f[9] == "1"
        # SNPs: single-base REF/ALT, INFO "."
        assert len(f[3]) == 1 and len(f[4]) == 1 and f[7] == "."


def test_cli_find_tsv(genome_pair, capsys):
    ref_path, q_path, _ = genome_pair
    out = _run(["find", "-r", str(ref_path), str(q_path)], capsys)
    lines = out.strip().splitlines()
    assert lines[0].split("\t") == [
        "query", "ref", "q.start", "q.end", "strand", "length", "mismatches",
        "gap_bases", "gap_opens", "identity", "coverage", "query.contig",
        "ref.contig",
    ]
    rows = [l.split("\t") for l in lines[1:]]
    assert rows, "expected at least one alignment segment"
    fw = [r for r in rows if r[4] == "+"]
    assert fw and fw[0][2] == "1"  # forward hit starting at query base 1


def test_cli_map_aln(genome_pair, capsys):
    ref_path, q_path, planted = genome_pair
    out = _run(
        ["map", "-r", str(ref_path), str(q_path), "-k", "51"], capsys
    )
    lines = out.strip().splitlines()
    assert lines[0].startswith(">")
    aln = lines[1]
    ref_seq = read_fastx(ref_path)[0][1].decode()
    assert len(aln) == len(ref_seq)
    # planted SNP positions should carry the query's base, not the ref's
    q_seq = read_fastx(q_path)[0][1].decode()
    for p in planted:
        assert aln[p] == q_seq[p] != ref_seq[p]
    # most positions recover the reference
    same = sum(1 for a, b in zip(aln, ref_seq) if a == b)
    assert same > 0.95 * len(ref_seq)


def test_cli_build_and_find_prebuilt(genome_pair, tmp_path, capsys):
    ref_path, q_path, _ = genome_pair
    prefix = str(tmp_path / "idx")
    _run(["build", "-o", prefix, str(ref_path)], capsys)
    out = _run(["find", "-i", prefix, str(q_path)], capsys)
    assert len(out.strip().splitlines()) >= 2


def test_cli_find_checkpoint_resume(genome_pair, tmp_path, capsys):
    ref_fa, query_fa, _ = genome_pair
    out_path = str(tmp_path / "hits.tsv")
    main(["find", str(query_fa), "-r", str(ref_fa), "-o", out_path])
    first = open(out_path).read()
    ckpt = open(f"{out_path}.ckpt").read().strip()
    # ckpt line: "<target>\t<query file>\t<output byte offset>"
    target, qfile, off = ckpt.rsplit("\t", 2)
    assert qfile.endswith(".fasta") and int(off) == len(first.encode())
    # resume with the pair already done: no duplicate rows appended
    main(["find", str(query_fa), "-r", str(ref_fa), "-o", out_path, "--resume"])
    assert open(out_path).read() == first
    # resume after a crash that flushed rows past the checkpoint: the
    # torn tail is truncated before the pair reruns (no duplicates)
    with open(out_path, "a") as fh:
        fh.write("torn partial row")
    main(["find", str(query_fa), "-r", str(ref_fa), "-o", out_path, "--resume"])
    assert open(out_path).read() == first
    # fresh run without --resume overwrites and invalidates the ckpt
    main(["find", str(query_fa), "-r", str(ref_fa), "-o", out_path])
    assert open(out_path).read() == first
