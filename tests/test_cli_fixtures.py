"""Byte-for-byte CLI output fixtures, hand-derived from the reference
(VERDICT r1 #2).

No Rust toolchain exists in this environment (no cargo/rustc on disk, no
network egress), so kbo-cli cannot be run to generate cross-fixtures.
Instead, every expected byte below is derived by hand from reference-
documented material only -- never from this repo's implementation:

- input sequences: the rustdoc doctest vectors (call: src/lib.rs:525-526;
  find: src/lib.rs:780-786; map: src/lib.rs:646-660), committed verbatim
  under tests/fixtures/.
- expected variants / RLE segments: the doctests' own asserted outputs
  (src/lib.rs:538-544, :797-805, :659-660).
- CLI conventions: the kbo-cli output embedded in the rustdoc -- VCF v4.4
  header lines + INDEL anchoring (src/lib.rs:77-98: `4335 . AA A ... INDEL`
  = deletion anchored on the preceding reference base, POS at the anchor),
  the 13-column find TSV with identity = 100*matches/length and
  coverage = 100*(matches+mismatches)/ref_len (verified against the
  numeric rows at src/lib.rs:122-127), and `.aln` fasta-style map output
  (src/lib.rs:230-236).

The volatile VCF header lines (##fileDate, ##source) are normalized
before comparison; everything else is compared byte-for-byte.
"""

import os

import pytest

from kbo_tpu.cli import main

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fx(name: str) -> str:
    return os.path.join(FIXTURES, name)


def _run_cli(argv, capsys) -> str:
    main(argv)
    return capsys.readouterr().out


def test_cli_call_vcf_fixture(capsys):
    """call doctest pair (src/lib.rs:525-544, k=20, p=1e-3) through the CLI.

    The doctest asserts exactly three variants (positions in the user's
    reference; chars role-inverted per src/lib.rs:561-568):
      Variant{query_pos: 22, query_chars: "AGG", ref_chars: ""}  (deletion)
      Variant{query_pos: 42, query_chars: "T",   ref_chars: "C"} (SNP)
      Variant{query_pos: 60, query_chars: "",    ref_chars: "C"} (insertion)
    VCF mapping per the kbo-cli example (src/lib.rs:84-98): SNP rows at
    query_pos+1; indels anchored on the preceding reference base.  The
    reference sequence (lib.rs:525) has ref[21]='C' and ref[59]='C'.
    """
    out = _run_cli(
        [
            "call",
            "-k", "20",
            "--max-error-prob", "0.001",
            "-r", _fx("call_ref.fasta"),
            _fx("call_query.fasta"),
        ],
        capsys,
    )
    lines = out.splitlines()
    # normalize the volatile header lines (date and tool version)
    assert lines[2].startswith("##fileDate=")
    assert lines[3].startswith("##source=")
    lines[2] = "##fileDate=NORMALIZED"
    lines[3] = "##source=NORMALIZED"
    expected = [
        "##fileformat=VCFv4.4",
        "##contig=<ID=ref,length=71>",
        "##fileDate=NORMALIZED",
        "##source=NORMALIZED",
        "##reference=call_ref.fasta",
        "##phasing=none",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tunknown",
        "ref\t22\t.\tCAGG\tC\t.\t.\tINDEL\tGT\t1",
        "ref\t43\t.\tT\tC\t.\t.\t.\tGT\t1",
        "ref\t60\t.\tC\tCC\t.\t.\tINDEL\tGT\t1",
    ]
    assert lines == expected


def _revcomp(seq: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(seq))


def _longest_common_substring(a: str, b: str) -> int:
    """Brute-force longest common substring length (inputs are ~1kb)."""
    best = 0
    for m in range(min(len(a), len(b)), 0, -1):
        if m <= best:
            break
        subs = {a[i : i + m] for i in range(len(a) - m + 1)}
        if any(b[j : j + m] in subs for j in range(len(b) - m + 1)):
            best = m
            break
    return best


def test_cli_find_tsv_fixture(capsys):
    """find doctest (src/lib.rs:779-806, k=31, max_gap_len=50) through the CLI.

    The doctest asserts exactly two forward-strand segments:
      RLE{start: 0,   end: 513,  matches: 512, mismatches: 1}
      RLE{start: 593, end: 1340, matches: 709, gap_bases: 38, gap_opens: 3}
    TSV columns per the kbo-cli table (src/lib.rs:122-127): 1-based q.start,
    identity = 100*matches/length, coverage = 100*(matches+mismatches)/
    ref_len with ref_len = 513 + 723 = 1236 (both reference contigs).
      row 1: identity 100*512/513 = 99.81, coverage 100*513/1236 = 41.50
      row 2: length 747, identity 100*709/747 = 94.91,
             coverage 100*709/1236 = 57.36
    """
    ref_txt = open(_fx("find_ref.fasta")).read().splitlines()
    gene1, gene2_rc = ref_txt[1], ref_txt[3]
    query = open(_fx("find_query.fasta")).read().splitlines()[1]
    assert (len(gene1), len(gene2_rc), len(query)) == (513, 723, 1340)

    # The reverse complement of the query shares only short substrings
    # with the indexed contigs, below the derandomization threshold, so
    # the '-' strand contributes no segments: all noisy MS values stay
    # under t, derandomize zeroes them, and the translation is all '-'.
    # t is computed here from the documented formula (src/derandomize.rs:
    # 127-145: smallest t with n*ln(1-(1/4)^(t+1)) > ln(1-p)) in pure
    # Python, independent of the package under test.
    import math

    n_kmers = (513 - 31 + 1) + (723 - 31 + 1)  # 1176
    p = 1e-7
    t = next(
        t
        for t in range(1, 32)
        if n_kmers * math.log(1.0 - 0.25 ** (t + 1)) > math.log(1.0 - p)
    )
    assert t >= 15  # generous floor: exact n_kmers conventions may shift t by 1
    rc = _revcomp(query)
    assert _longest_common_substring(rc, gene1) < 15
    assert _longest_common_substring(rc, gene2_rc) < 15

    out = _run_cli(
        [
            "find",
            "--max-gap-len", "50",
            "-r", _fx("find_ref.fasta"),
            _fx("find_query.fasta"),
        ],
        capsys,
    )
    header = (
        "query\tref\tq.start\tq.end\tstrand\tlength\tmismatches\tgap_bases"
        "\tgap_opens\tidentity\tcoverage\tquery.contig\tref.contig"
    )
    expected = "\n".join(
        [
            header,
            "find_query.fasta\tfind_ref.fasta\t1\t513\t+\t513\t1\t0\t0"
            "\t99.81\t41.50\tquery\tfind_ref.fasta",
            "find_query.fasta\tfind_ref.fasta\t594\t1340\t+\t747\t0\t38\t3"
            "\t94.91\t57.36\tquery\tfind_ref.fasta",
        ]
    ) + "\n"
    assert out == expected


def test_cli_map_aln_fixture(capsys):
    """map doctest 1 (src/lib.rs:646-660, k=3) through the CLI.

    The doctest asserts the full map output on the 14-base reference is
    b"---------AGG--" (bytes [45x9, 65, 71, 71, 45, 45]).
    """
    out = _run_cli(
        [
            "map",
            "-k", "3",
            "-r", _fx("map_ref.fasta"),
            _fx("map_query.fasta"),
        ],
        capsys,
    )
    assert out == ">map_query.fasta\n---------AGG--\n"
