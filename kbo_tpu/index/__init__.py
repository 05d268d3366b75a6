"""SBWT index: data structure, construction, serialization."""

from kbo_tpu.index.sbwt import SbwtIndex
from kbo_tpu.index.build import build_sbwt_from_seqs

__all__ = ["SbwtIndex", "build_sbwt_from_seqs"]
