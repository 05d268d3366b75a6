"""Index serialization.

The reference's on-disk format is the sbwt crate's internal layout behind a
"SubsetMatrix" length-prefixed header (reference: src/index.rs:128-151); the
crate's source is not available here, so byte-level interop is not
implemented. Instead we persist the packed-bitvector layout directly as an
``.npz`` (the checkpoint role the reference's serializer plays, SURVEY §5
"Checkpoint / resume"): ``<prefix>.kbo.npz`` holds everything needed to
reconstruct :class:`SbwtIndex`, including the LCS array.
"""

from __future__ import annotations

import numpy as np

from kbo_tpu.index.sbwt import SbwtIndex

_FORMAT_VERSION = 2


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
        keys3=index.keys3,
        dummy2=index.dummy2,
        dummy_v=index.dummy_v,
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
            keys3=data["keys3"],
            dummy2=data["dummy2"],
            dummy_v=data["dummy_v"],
        )
