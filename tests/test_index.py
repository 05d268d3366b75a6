"""Golden tests for index construction and MS queries
(reference: src/index.rs tests + doctests)."""

import numpy as np

from kbo_tpu import BuildOpts, build
from kbo_tpu.ops.ms import query_ms


REFERENCE = b"AAAGAACCA-TCAGGGCG"
QUERY = b"CAAGCCACTCATTGGGTC"


def test_build_and_query_sbwt():
    # reference: src/index.rs:261-274 (golden MS vector :238-240)
    sbwt = build([REFERENCE], BuildOpts(k=3))
    ms, _ = query_ms(sbwt, QUERY)
    assert ms.tolist() == [1, 2, 2, 3, 2, 2, 3, 2, 1, 2, 3, 1, 1, 1, 2, 3, 1, 2]


def test_index_counts():
    sbwt = build([REFERENCE], BuildOpts(k=3))
    # 13 distinct ACGT 3-mers across the two segments
    assert sbwt.n_kmers == 13
    # + root $$$ + dummies $$A, $AA, $$T, $TC
    assert sbwt.n_rows == 18
    assert sbwt.k == 3


def test_access_kmer_roundtrip():
    sbwt = build([REFERENCE], BuildOpts(k=3))
    # every full k-mer row should reconstruct to a 3-mer present in a segment
    segs = [b"AAAGAACCA", b"TCAGGGCG"]
    all_kmers = {
        seg[i : i + 3] for seg in segs for i in range(len(seg) - 2)
    }
    got = set()
    for row in range(sbwt.n_rows):
        kmer = sbwt.access_kmer(row)
        if b"$" not in kmer:
            got.add(kmer)
    assert got == all_kmers


def test_search_codes():
    from kbo_tpu.index.encode import encode_ascii

    sbwt = build([REFERENCE], BuildOpts(k=3))
    assert sbwt.search_codes(encode_ascii(b"GGG")) is not None
    assert sbwt.search_codes(encode_ascii(b"GGT")) is None
    l, r = sbwt.search_codes(encode_ascii(b"TCA"))
    assert r - l == 1
    assert sbwt.access_kmer(l) == b"TCA"


def test_intervals_unique_rows():
    sbwt = build([REFERENCE], BuildOpts(k=3))
    ms, ivals = query_ms(sbwt, QUERY)
    # where ms == k the interval is that of a full k-mer
    for i in range(len(QUERY)):
        if ms[i] == 3:
            l, r = ivals[i]
            kmer = sbwt.access_kmer(int(l))
            assert kmer == QUERY[i - 2 : i + 1]


def test_n_rows_multiple_of_32():
    """Regression: rank at pos == n_rows must stay in-bounds when n_rows is
    an exact multiple of 32 (guard word)."""
    import numpy as np
    from kbo_tpu.kernels.ms import query_ms_device
    from kbo_tpu import native

    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(32)
    # single segment of length L yields L+1 rows; L = 127 -> 128 rows
    for L in (127, 255):
        seq = BASES[rng.integers(0, 4, L)].tobytes()
        sbwt = build([seq], BuildOpts(k=9))
        if sbwt.n_rows % 32 != 0:
            continue
        q = seq[3:90] + b"T" + seq[90:120]
        from kbo_tpu.index.encode import encode_ascii
        codes = encode_ascii(q)
        ms_h, iv_h = query_ms(sbwt, q)
        ms_d, iv_d = query_ms_device(sbwt, codes)
        np.testing.assert_array_equal(ms_d, ms_h)
        np.testing.assert_array_equal(iv_d, iv_h)
        if native.available():
            ms_n, iv_n = native.ms_stream(sbwt, codes)
            np.testing.assert_array_equal(ms_n, ms_h)


def test_sbwt_lcs_file_pair_roundtrip(tmp_path):
    """The .sbwt/.lcs file-pair form (reference: src/index.rs:128-151):
    u64-LE length prefix + "SubsetMatrix" header, LCS in its own file."""
    import struct

    from kbo_tpu.index.serialize import load_sbwt, serialize_sbwt

    from kbo_tpu.index.encode import encode_ascii
    from kbo_tpu.ops.ms import query_ms_codes

    sbwt = build([b"AAAGAACCA-TCAGGGCG"], BuildOpts(k=3))
    prefix = str(tmp_path / "idx")
    sbwt_path, lcs_path = serialize_sbwt(prefix, sbwt)
    raw = open(sbwt_path, "rb").read()
    (n,) = struct.unpack("<Q", raw[:8])
    assert raw[8 : 8 + n] == b"SubsetMatrix"
    loaded = load_sbwt(prefix)
    assert loaded.k == sbwt.k and loaded.n_rows == sbwt.n_rows
    np.testing.assert_array_equal(loaded.bits, sbwt.bits)
    np.testing.assert_array_equal(loaded.lcs, sbwt.lcs)
    np.testing.assert_array_equal(loaded.keys2, sbwt.keys2)
    # query parity through the loaded index
    codes = encode_ascii(b"CAAGCCACTCATTGGGTC")
    np.testing.assert_array_equal(
        query_ms_codes(loaded, codes)[0], query_ms_codes(sbwt, codes)[0]
    )


def test_threaded_build_parity():
    """num_threads > 1 partitions the colex sort by last character; the
    result must be identical to the single-threaded build."""
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bases[rng.integers(0, 4, 200000)].tobytes()
    a = build([seq], BuildOpts(k=21, num_threads=1))
    b = build([seq], BuildOpts(k=21, num_threads=4))
    assert a.n_rows == b.n_rows and a.n_kmers == b.n_kmers
    np.testing.assert_array_equal(a.bits, b.bits)
    np.testing.assert_array_equal(a.lcs, b.lcs)
    np.testing.assert_array_equal(a.keys2, b.keys2)
    np.testing.assert_array_equal(a.keys3, b.keys3)


def test_disk_backed_build_matches_memory():
    """BitPackedKmerSorting analogue (reference: src/index.rs:64-81):
    temp_dir switches to the bucketed disk sort; output must be
    bit-identical to the in-memory build across every index field,
    exercising multiple pass-1 chunks (mem_gb=0 floors the chunk at 64k
    positions) and both dedup_batches modes."""
    import tempfile

    import numpy as np

    from kbo_tpu import BuildOpts
    from kbo_tpu.index.build import build_sbwt_from_seqs

    rng = np.random.default_rng(44)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = [
        bases[rng.integers(0, 4, 150_000)].tobytes(),
        bases[rng.integers(0, 4, 3_000)].tobytes() * 3,  # repetitive
        (bases[rng.integers(0, 4, 800)].tobytes() + b"NNN"
         + bases[rng.integers(0, 4, 1_200)].tobytes()),
    ]
    fields = ("bits", "cum", "C", "lcs", "keys2", "cap2", "keys3",
              "row_pos", "text")
    mem = build_sbwt_from_seqs(seqs, BuildOpts(k=31))
    with tempfile.TemporaryDirectory() as td:
        for dedup in (False, True):
            disk = build_sbwt_from_seqs(
                seqs,
                BuildOpts(k=31, temp_dir=td, mem_gb=0, dedup_batches=dedup),
            )
            assert (disk.n_rows, disk.n_kmers) == (mem.n_rows, mem.n_kmers)
            for f in fields:
                np.testing.assert_array_equal(
                    getattr(disk, f), getattr(mem, f), err_msg=f
                )


def test_threaded_build_k_above_32_matches_single_thread():
    """Regression: the threaded colex sort's bucket partition must cover
    the 2-bit keyspace's full top range -- a 0..4 partition silently
    dropped most join-table rows for k > 32, num_threads > 1, n > 65536."""
    import numpy as np

    from kbo_tpu import BuildOpts
    from kbo_tpu.index.build import build_sbwt_from_seqs

    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bases[rng.integers(0, 4, 200_000)].tobytes()
    one = build_sbwt_from_seqs([seq], BuildOpts(k=40, num_threads=1))
    four = build_sbwt_from_seqs([seq], BuildOpts(k=40, num_threads=4))
    assert one.n_rows == four.n_rows
    for f in ("keys2", "cap2", "keys3", "row_pos", "lcs"):
        np.testing.assert_array_equal(getattr(one, f), getattr(four, f), f)
