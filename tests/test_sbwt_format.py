"""The kbo-compatible .sbwt/.lcs byte layout (reference: src/index.rs:128-151,
195-212): write -> parse -> full index reconstruction from bitvectors alone.

The reconstruction path is the hard part: the reader regenerates row texts,
join keys, and caps from the subset-matrix bitvectors via predecessor
propagation, so parity must hold for every derived array and for MS queries
through both the host oracle and the device engine.
"""

import struct

import numpy as np
import pytest

from kbo_tpu import BuildOpts, build
from kbo_tpu.index.encode import encode_ascii
from kbo_tpu.index.sbwt_format import read_kbo_sbwt, write_kbo_sbwt
from kbo_tpu.ops.ms import query_ms_codes

REFERENCE = b"AAAGAACCA-TCAGGGCG"
QUERY = b"CAAGCCACTCATTGGGTC"


def _roundtrip(tmp_path, seqs, k):
    sbwt = build(seqs, BuildOpts(k=k))
    prefix = str(tmp_path / "idx")
    write_kbo_sbwt(prefix, sbwt)
    return sbwt, read_kbo_sbwt(prefix)


def _assert_full_parity(sbwt, loaded):
    assert loaded.k == sbwt.k
    assert loaded.n_rows == sbwt.n_rows
    assert loaded.n_kmers == sbwt.n_kmers
    np.testing.assert_array_equal(loaded.bits, sbwt.bits)
    np.testing.assert_array_equal(loaded.cum, sbwt.cum)
    np.testing.assert_array_equal(loaded.C, sbwt.C)
    np.testing.assert_array_equal(loaded.lcs, sbwt.lcs)
    np.testing.assert_array_equal(loaded.keys3, sbwt.keys3)
    np.testing.assert_array_equal(loaded.keys2, sbwt.keys2)
    np.testing.assert_array_equal(loaded.cap2, sbwt.cap2)
    # row texts reconstruct identically (the text buffers differ by
    # design -- construction buffer vs per-row expansion -- but every
    # row's k-mer must match)
    rows = np.arange(sbwt.n_rows)
    np.testing.assert_array_equal(
        loaded.access_kmers_codes(rows), sbwt.access_kmers_codes(rows)
    )


def test_roundtrip_golden(tmp_path):
    sbwt, loaded = _roundtrip(tmp_path, [REFERENCE], 3)
    _assert_full_parity(sbwt, loaded)
    codes = encode_ascii(QUERY)
    ms, iv = query_ms_codes(loaded, codes)
    ms0, iv0 = query_ms_codes(sbwt, codes)
    np.testing.assert_array_equal(ms, ms0)
    np.testing.assert_array_equal(iv, iv0)
    # the golden MS vector (reference: src/index.rs:238-240)
    assert ms.tolist() == [1, 2, 2, 3, 2, 2, 3, 2, 1, 2, 3, 1, 1, 1, 2, 3, 1, 2]


@pytest.mark.parametrize("k", [7, 16, 31, 33, 63])
def test_roundtrip_random_multisegment(tmp_path, k):
    rng = np.random.default_rng(k)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bytearray(bases[rng.integers(0, 4, 4000)].tobytes())
    for p in range(100, 3900, 371):  # non-ACGT breaks -> many segments
        seq[p] = ord("N")
    sbwt, loaded = _roundtrip(tmp_path, [bytes(seq)], k)
    _assert_full_parity(sbwt, loaded)
    q = bytes(seq[200:900]).replace(b"N", b"A")
    codes = encode_ascii(q)
    np.testing.assert_array_equal(
        query_ms_codes(loaded, codes)[0], query_ms_codes(sbwt, codes)[0]
    )


def test_device_engine_through_loaded_index(tmp_path):
    from kbo_tpu.kernels.ms import query_ms_device

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bases[rng.integers(0, 4, 3000)].tobytes()
    sbwt, loaded = _roundtrip(tmp_path, [seq], 31)
    q = seq[500:1500]
    codes = encode_ascii(q)
    ms_d, iv_d = query_ms_device(loaded, codes)
    ms_h, iv_h = query_ms_codes(sbwt, codes)
    np.testing.assert_array_equal(np.asarray(ms_d), ms_h)
    np.testing.assert_array_equal(np.asarray(iv_d), iv_h)


def test_header_and_defensive_reader(tmp_path):
    sbwt = build([REFERENCE], BuildOpts(k=3))
    prefix = str(tmp_path / "idx")
    sbwt_path, lcs_path = write_kbo_sbwt(prefix, sbwt)
    raw = open(sbwt_path, "rb").read()
    (n,) = struct.unpack("<Q", raw[:8])
    assert raw[8 : 8 + n] == b"SubsetMatrix"
    # wrong variant name -> ValueError naming the variant
    bad = str(tmp_path / "bad")
    with open(f"{bad}.sbwt", "wb") as fh:
        fh.write(struct.pack("<Q", 6) + b"Plain!" + raw[20:])
    with open(f"{bad}.lcs", "wb") as fh:
        fh.write(open(lcs_path, "rb").read())
    with pytest.raises(ValueError, match="Plain!"):
        read_kbo_sbwt(bad)
    # corrupted popcount -> structural ValueError (a raise, not an assert:
    # untrusted-input checks must survive python -O)
    corrupt = bytearray(raw)
    corrupt[8 + n + 8 + 8 : 8 + n + 8 + 16] = struct.pack("<Q", 999999)
    bad2 = str(tmp_path / "bad2")
    with open(f"{bad2}.sbwt", "wb") as fh:
        fh.write(bytes(corrupt))
    with open(f"{bad2}.lcs", "wb") as fh:
        fh.write(open(lcs_path, "rb").read())
    with pytest.raises(ValueError, match="popcount"):
        read_kbo_sbwt(bad2)


def test_serialize_module_uses_byte_format(tmp_path):
    """serialize_sbwt/load_sbwt (the API + CLI surface) now emit and parse
    the byte layout, not the legacy npz payload."""
    from kbo_tpu.index.serialize import load_sbwt, serialize_sbwt

    sbwt = build([REFERENCE], BuildOpts(k=3))
    prefix = str(tmp_path / "idx")
    sbwt_path, _ = serialize_sbwt(prefix, sbwt)
    raw = open(sbwt_path, "rb").read()
    assert raw[20:22] != b"PK"  # not a zip: the real byte layout
    _assert_full_parity(sbwt, load_sbwt(prefix))


def test_lcs_intvector_packing(tmp_path):
    """.lcs is a simple-sds-style IntVector: len, width, LSB-first words."""
    sbwt = build([REFERENCE], BuildOpts(k=15))
    prefix = str(tmp_path / "idx")
    _, lcs_path = write_kbo_sbwt(prefix, sbwt)
    raw = open(lcs_path, "rb").read()
    n_elem, width, W = struct.unpack_from("<QQQ", raw, 0)
    assert n_elem == sbwt.n_rows
    assert width == max(1, (sbwt.k - 1).bit_length())
    assert W == (n_elem * width + 63) // 64
    assert len(raw) == 24 + 8 * W
    loaded = read_kbo_sbwt(prefix)
    np.testing.assert_array_equal(loaded.lcs, sbwt.lcs)
