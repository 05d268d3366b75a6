"""Golden tests for the top-level API (reference: src/lib.rs doctests)."""

from kbo_tpu import (
    BuildOpts,
    CallOpts,
    FindOpts,
    MapOpts,
    MatchOpts,
    RLE,
    Variant,
    build,
    call,
    find,
    map_,
    matches,
)


def test_matches_doctest():
    # reference: src/lib.rs:594-610
    sbwt = build([b"AAAGAACCA-TCAGGGCG"], BuildOpts(k=3))
    query = b"GTGACTATGAGGAT"
    got = matches(query, sbwt, MatchOpts())
    assert got == list("---------MMM--")


def test_find_doctest():
    # reference: src/lib.rs:779-806 (2 genes + recombinant query, k=31)
    gene1 = (
        b"ATGGCTGTTCCATCATCAAAAGAAGAGTTAATTAAAGCTATTAATAGTAATTTTTCTTTATTAAATAAGA"
        b"AGCTAGAATCTATTACGCCCCAACTCGCCTTTGAACCTCTATTGGAAGGGCACGCGAAGGGGACTACGAT"
        b"TAGCGTAGCGAATCTGGTTTCCTATCTGATTGGCTGGGGAGAGCTGGTGTTACACTGGCATGACCAAGAG"
        b"GCAAAAGGAAAAACTATTATTTTTCCTGAGGAAGGATTTAAATGGAATGAATTGGGGCGTTTAGCACAGA"
        b"AATTCTACCGTGACTATGAGGATATTACAGAGTACGAAGTTTTATTGGCACGGTTAAAGGAAAATAAGCA"
        b"GCAACTCGTGGCTTTGATTGAACGATTCAGTAACGACGAGCTTTACGGTAAACCTTGGTATAATAAATGG"
        b"ACCCGAGGTCGTATGATTCAATTTAATACCGCCTCGCCTTATAAAAATGCTTCGGGGAGGTTAAATAAAC"
        b"TGCAGAAATGTCTTGCAGAATAG"
    )
    gene2_rc = (
        b"CTACCCTACTATTTCGAGTGATTCAATCGTCTGGTTCACATAACCTACCACCTGTTCAAAATGCTTATCG"
        b"ACAAAAAAATGATCGGCAGCAGGAAATATAATAGTCCGCGTCTTTCGTGTGGTGAATTTTTCCCATGCAA"
        b"GTAATTCATCCTGCATTACCAGATTGTCAGCATCGCCATGAAATAGCACGATCGGACAGGTTAATGTGCG"
        b"CGCCTTGGCCTGAAATACATACTGCTCATAGAGCCGATAATCGTTTTTAATGATGGGGGTGAAAATTGTC"
        b"ATTAACTCTTTATTACGAAAGACATCAACCGGAGTTCCGCCCAGCTTGACGATCTCTTCCATAAACGCCT"
        b"GATCGGGCAAGGTATGCAGTATTACTTCATGAGAGGCCCGATCGGGTGGGCGACAGCCGGAAAAAAACAG"
        b"CGCGCATGGCATGTCATGTCCATGATCGAGAATATAATGCACCAGTTCGAAGGCCATGATCCCTCCGAGA"
        b"CTATGCCCAAAAATGGCGTAGTCTCCACCTGTGTAGTGTTTCACAAATTGTTGATAAAGGTCAGCGACGG"
        b"CATCCACCATCGTAAGACACAGCGGCTGGCGTATTCTAGTTCCCCTCCCCGCAGGTTCTAAAGGCCGCAA"
        b"AGTAATATTGTCCGACAGCACGCTACGCCATTTATAATACATGGCGGCAGAACCACCTGAATATGGCAAA"
        b"CAATACAAACTGATATTACTCAT"
    )
    query = (
        b"ATGGCTGTTCCATCATCAAAAGAAGAGTTAATTAAAGCTATTAATAGTAATTTTTCTTTATTAAATAAGA"
        b"AGCTAGACTCTATTACGCCCCAACTCGCCTTTGAACCTCTATTGGAAGGGCACGCGAAGGGGACTACGAT"
        b"TAGCGTAGCGAATCTGGTTTCCTATCTGATTGGCTGGGGAGAGCTGGTGTTACACTGGCATGACCAAGAG"
        b"GCAAAAGGAAAAACTATTATTTTTCCTGAGGAAGGATTTAAATGGAATGAATTGGGGCGTTTAGCACAGA"
        b"AATTCTACCGTGACTATGAGGATATTACAGAGTACGAAGTTTTATTGGCACGGTTAAAGGAAAATAAGCA"
        b"GCAACTCGTGGCTTTGATTGAACGATTCAGTAACGACGAGCTTTACGGTAAACCTTGGTATAATAAATGG"
        b"ACCCGAGGTCGTATGATTCAATTTAATACCGCCTCGCCTTATAAAAATGCTTCGGGGAGGTTAAATAAAC"
        b"TGCAGAAATGTCTTGCAGAATAGAAAAAAAAAAAAAAAAAAAAAAAAAAAAAGGGGGGGGGGGGGGGGGG"
        b"GGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGG"
        b"CTACCCTACTATTTCGAGTGATTCAATCGTCTGGTTCACATAACCTACCACCTGTTCAAAATGCTTATCG"
        b"ACAAAAAAATGATCGGCAGCAGGAAATATAATAGTCCGCGTCTTTCGTGTGGTGAATTTTTCCCATGCAA"
        b"GTAATTCATCCTGCATTACCAGATTGTCAGCATCGCCATGAAATAGCACGATCGGACAGGTTAATGTGCG"
        b"CGCCTTGGCCTGAAATACATACTGCTCATAGAGCCGATAATCGTGTGTAATGATGGGGGTGAAAATTGTC"
        b"ATTAACTCTTTATTACGAAAGACATCAACCGGAGTTCCGCCCAGCTTGACGATCTCTTCCATAAACGCCT"
        b"GATCGGGCAAGGTATGCATTTTTTTTTTTTTTTTTTTTTTTTTT"
        b"GTATTACTTCATGAGAGGCCCGATCGGGTGGGCGACAGCCGGAAAAAAACAGCGCGCATGGCATGTCATG"
        b"TCCATGATCGAGAATATAATGCACCAGTTCGAAGGCCATGATCCCTCCGAGACTATGCCCAAAAATGGCG"
        b"TAGTCTCCACCTGTGTAGTGTTTCACAAATTGTTGATAAAGGTCAGCGACGGCATCCACCATCGTAAGAC"
        b"ACAGCGGCTGGCGTATTCTAGTTCCCCTCCCCGCAGGTTCTAAAGGCCGCAAAATAATATTGCGACAGCA"
        b"CGCTACGCCATTTATAATACATGGCGGCAGAACCACCTGAATATGGCAAACAATACAAACTGATATTACT"
        b"CAT"
    )
    sbwt = build([gene1, gene2_rc], BuildOpts(k=31))
    got = find(query, sbwt, FindOpts(max_gap_len=50))
    assert got == [
        RLE(start=0, end=513, matches=512, mismatches=1, jumps=0, gap_bases=0, gap_opens=0),
        RLE(start=593, end=1340, matches=709, mismatches=0, jumps=0, gap_bases=38, gap_opens=3),
    ]


def test_call_doctest():
    # reference: src/lib.rs:518-545
    reference = b"TCGTGGATCGATACACGCTAGCAGGCTGACTCGATGGGATACTATGTGTTATAGCAATTCGGATCGATCGA"
    query = b"TCGTGGATCGATACACGCTAGCCTGACTCGATGGGATACCATGTGTTATAGCAATTCCGGATCGATCGA"

    opts = CallOpts(max_error_prob=0.001)
    opts.sbwt_build_opts.k = 20
    sbwt_query = build([query], opts.sbwt_build_opts)
    variants = call(sbwt_query, reference, opts)
    assert variants == [
        Variant(query_pos=22, query_chars=b"AGG", ref_chars=b""),
        Variant(query_pos=42, query_chars=b"T", ref_chars=b"C"),
        Variant(query_pos=60, query_chars=b"", ref_chars=b"C"),
    ]


def test_map_full_doctest():
    # reference: src/lib.rs:640-661
    query = [b"AAAGAACCA-TCAGGGCG"]
    opts = BuildOpts(k=3, build_select=True)
    sbwt_query = build(query, opts)
    map_opts = MapOpts()
    map_opts.sbwt_build_opts = opts
    reference = b"GTGACTATGAGGAT"
    got = map_(reference, sbwt_query, map_opts)
    assert list(got) == [45, 45, 45, 45, 45, 45, 45, 45, 45, 65, 71, 71, 45, 45]


def test_map_no_refine_doctest():
    # reference: src/lib.rs:663-689
    reference = b"CGTTGACTCTAGGTGCCTGGGTTCTCAGAGCTGGGC"
    query = b"CGTTGACTGGTGCCTGGGTTCTCAGAGCTGGGC"
    opts = BuildOpts(k=7, build_select=True)
    map_opts = MapOpts(
        fill_gaps=False, call_variants=False, max_error_prob=0.1,
        sbwt_build_opts=opts,
    )
    sbwt_query = build([query], opts)
    got = map_(reference, sbwt_query, map_opts)
    assert got == b"CGTTGACT---GGTGCCTGGGTTCTCAGAGCTGGGC"


def test_map_internal_doctest():
    # reference: src/lib.rs:691-718
    reference = b"CGTTGACTCTAGGTGCCTGGGTTCTCAGAGCTGGGC"
    query = b"CGTTGACTGGTGCCTGGGTTCTCAGAGCTGGGC"
    opts = BuildOpts(k=7, build_select=True)
    map_opts = MapOpts(
        fill_gaps=False, call_variants=False, format=False, max_error_prob=0.1,
        sbwt_build_opts=opts,
    )
    sbwt_query = build([query], opts)
    got = map_(reference, sbwt_query, map_opts)
    assert got == b"MMMMMMMM---MMMMMMMMMMMMMMMMMMMMMMMMM"


def test_map_batch_matches_map():
    """map_batch over several contigs equals per-contig map_."""
    import numpy as np

    from kbo_tpu import BuildOpts, MapOpts, build, map_
    from kbo_tpu.api import map_batch

    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    query = bases[rng.integers(0, 4, 4000)].tobytes()
    refs = []
    for s, e, mut in ((0, 1500, 700), (1500, 2900, 2000), (2900, 4000, 3300)):
        r = bytearray(query[s:e])
        r[mut - s] = bases[(np.frombuffer(query[mut:mut+1], np.uint8)[0] % 4 + 1) % 4]
        refs.append(bytes(r))

    opts_b = BuildOpts(k=51, build_select=True)
    sbwt_q = build([query], opts_b)
    opts = MapOpts(sbwt_build_opts=opts_b)
    batched = map_batch(refs, sbwt_q, opts)
    single = [map_(r, sbwt_q, opts) for r in refs]
    assert batched == single


def test_find_batch_matches_find():
    import numpy as np

    from kbo_tpu import BuildOpts, FindOpts, build, find
    from kbo_tpu.api import find_batch

    rng = np.random.default_rng(14)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, 3000)].tobytes()
    queries = [ref[0:900], ref[1000:1400], bases[rng.integers(0, 4, 500)].tobytes()]
    sbwt = build([ref], BuildOpts(k=31))
    opts = FindOpts(max_gap_len=2)
    batched = find_batch(queries, sbwt, opts)
    single = [find(q, sbwt, opts) for q in queries]
    assert batched == single


def test_map_randomized_differential_vs_oracle():
    """Full map_ (join engine + sparse intervals + gap fill + call) vs the
    scalar host-oracle backend on a randomized indel-rich pair."""
    import os
    import subprocess
    import sys

    import numpy as np

    from kbo_tpu import BuildOpts, MapOpts, build, map_

    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n = 3000
    query = bases[rng.integers(0, 4, n)].tobytes()
    ref = bytearray(query)
    ref[500] = bases[(np.frombuffer(query[500:501], np.uint8)[0] % 4 + 1) % 4]
    del ref[1200:1203]
    ref[2000:2000] = b"GTC"
    ref[2500:2560] = bases[rng.integers(0, 4, 60)].tobytes()  # unrelated gap
    ref = bytes(ref)

    opts_b = BuildOpts(k=51, build_select=True)
    sbwt_q = build([query], opts_b)
    opts = MapOpts(sbwt_build_opts=opts_b)
    got = map_(ref, sbwt_q, opts)

    env = dict(os.environ, KBO_TPU_BACKEND="host")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import numpy as np\n"
        "from kbo_tpu import BuildOpts, MapOpts, build, map_\n"
        "query = bytes.fromhex(%r); ref = bytes.fromhex(%r)\n"
        "o = BuildOpts(k=51, build_select=True)\n"
        "aln = map_(ref, build([query], o), MapOpts(sbwt_build_opts=o))\n"
        "sys.stdout.write(aln.hex())\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         query.hex(), ref.hex())
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert bytes.fromhex(out.stdout.strip()) == got


def test_device_seq_index_find_parity():
    """Index-free find (device-built sorted sequence keys) matches find
    against the full host-built index, including n_kmers/threshold."""
    import numpy as np

    from kbo_tpu import BuildOpts, FindOpts, build
    from kbo_tpu.api import build_device, find_batch

    rng = np.random.default_rng(41)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bytearray(bases[rng.integers(0, 4, 4000)].tobytes())
    ref[1500] = ord("N")  # multi-segment
    ref = bytes(ref)
    queries = [
        ref[0:900],
        ref[1600:2400],
        bases[rng.integers(0, 4, 500)].tobytes(),
        (ref[100:400] + b"TTTT" + ref[500:800]),
    ]

    host_idx = build([ref], BuildOpts(k=31))
    dev_idx = build_device([ref], BuildOpts(k=31))
    assert dev_idx.n_kmers == host_idx.n_kmers

    opts = FindOpts(max_gap_len=3)
    assert find_batch(queries, dev_idx, opts) == find_batch(
        queries, host_idx, opts
    )
