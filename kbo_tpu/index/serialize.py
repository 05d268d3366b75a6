"""Index serialization.

Two on-disk forms:

- ``<prefix>.kbo.npz`` (:func:`save_index` / :func:`load_index`): the
  native checkpoint -- every array needed to reconstruct
  :class:`SbwtIndex`, including the LCS array and the packed join keys.

- ``<prefix>.sbwt`` + ``<prefix>.lcs`` (:func:`serialize_sbwt` /
  :func:`load_sbwt`): the reference's file-pair convention
  (reference: src/index.rs:128-151): the ``.sbwt`` file starts with a
  u64-LE length prefix followed by the variant name ``"SubsetMatrix"``,
  then the index payload; the ``.lcs`` file holds the LCS array. The
  header parses exactly like the reference's; the payload after it is this
  package's format (the sbwt crate's internal byte layout is not public --
  documented deviation, see README "Parity with the reference").

The ``.npz`` checkpoint is the system-of-record (SURVEY §5
"Checkpoint / resume"); the file pair exists so tooling that expects
``kbo build``-style ``.sbwt``/``.lcs`` outputs finds them.
"""

from __future__ import annotations

import io
import struct

import numpy as np

from kbo_tpu.index.sbwt import SbwtIndex

_FORMAT_VERSION = 3


def save_index(prefix: str, index: SbwtIndex) -> str:
    """Write the index to ``<prefix>.kbo.npz``; returns the path."""
    path = f"{prefix}.kbo.npz"
    np.savez_compressed(
        path,
        format_version=np.int64(_FORMAT_VERSION),
        variant=np.frombuffer(b"SubsetMatrix", dtype=np.uint8),
        k=np.int64(index.k),
        n_rows=np.int64(index.n_rows),
        n_kmers=np.int64(index.n_kmers),
        bits=index.bits,
        cum=index.cum,
        C=index.C,
        lcs=index.lcs,
        keys2=index.keys2,
        cap2=index.cap2,
        keys3=index.keys3,
        row_pos=index.row_pos,
        text=index.text,
    )
    return path


def load_index(prefix: str) -> SbwtIndex:
    """Load an index written by :func:`save_index` (accepts the full path or
    the prefix)."""
    path = prefix if prefix.endswith(".npz") else f"{prefix}.kbo.npz"
    with np.load(path) as data:
        assert int(data["format_version"]) == _FORMAT_VERSION
        assert bytes(data["variant"].tobytes()) == b"SubsetMatrix"
        return SbwtIndex(
            k=int(data["k"]),
            n_rows=int(data["n_rows"]),
            n_kmers=int(data["n_kmers"]),
            bits=data["bits"],
            cum=data["cum"],
            C=data["C"],
            lcs=data["lcs"],
            keys2=data["keys2"],
            cap2=data["cap2"],
            keys3=data["keys3"],
            row_pos=data["row_pos"],
            text=data["text"],
        )


_VARIANT = b"SubsetMatrix"


def serialize_sbwt(prefix: str, index: SbwtIndex) -> tuple[str, str]:
    """Write ``<prefix>.sbwt`` + ``<prefix>.lcs`` (reference file-pair
    convention, src/index.rs:128-151); returns both paths."""
    sbwt_path, lcs_path = f"{prefix}.sbwt", f"{prefix}.lcs"
    payload = io.BytesIO()
    np.savez_compressed(
        payload,
        format_version=np.int64(_FORMAT_VERSION),
        k=np.int64(index.k),
        n_rows=np.int64(index.n_rows),
        n_kmers=np.int64(index.n_kmers),
        bits=index.bits,
        cum=index.cum,
        C=index.C,
        keys2=index.keys2,
        cap2=index.cap2,
        keys3=index.keys3,
        row_pos=index.row_pos,
        text=index.text,
    )
    with open(sbwt_path, "wb") as fh:
        # u64-LE length prefix + variant name, as the reference writes it
        fh.write(struct.pack("<Q", len(_VARIANT)))
        fh.write(_VARIANT)
        fh.write(payload.getvalue())
    with open(lcs_path, "wb") as fh:
        fh.write(struct.pack("<Q", index.lcs.size))
        fh.write(np.ascontiguousarray(index.lcs, dtype=np.uint8).tobytes())
    return sbwt_path, lcs_path


def load_sbwt(prefix: str) -> SbwtIndex:
    """Load an index written by :func:`serialize_sbwt`
    (reference: src/index.rs:195-212)."""
    with open(f"{prefix}.sbwt", "rb") as fh:
        (name_len,) = struct.unpack("<Q", fh.read(8))
        variant = fh.read(name_len)
        if variant != _VARIANT:
            raise ValueError(
                f"unsupported SBWT variant {variant!r} (expected {_VARIANT!r})"
            )
        data = np.load(io.BytesIO(fh.read()))
    with open(f"{prefix}.lcs", "rb") as fh:
        (lcs_len,) = struct.unpack("<Q", fh.read(8))
        lcs = np.frombuffer(fh.read(lcs_len), dtype=np.uint8).copy()
    assert int(data["format_version"]) == _FORMAT_VERSION
    return SbwtIndex(
        k=int(data["k"]),
        n_rows=int(data["n_rows"]),
        n_kmers=int(data["n_kmers"]),
        bits=data["bits"],
        cum=data["cum"],
        C=data["C"],
        lcs=lcs,
        keys2=data["keys2"],
        cap2=data["cap2"],
        keys3=data["keys3"],
        row_pos=data["row_pos"],
        text=data["text"],
    )
